"""aiohttp OpenAI/Anthropic-compatible server.

The analog of `mistralrs-server-core` (axum): routes per
`route_registry.rs:27-107` (the text-serving subset), SSE streaming per
`streaming.rs`, Prometheus `/metrics` per `metrics.rs:119`.

Threading model: the Engine steps on a dedicated worker thread (the analog of
the reference's per-engine thread, `Engine::run`); HTTP handlers enqueue
requests and consume token deltas via asyncio queues bridged with
`call_soon_threadsafe`.
"""

from __future__ import annotations

import asyncio
import json
import threading
import time
from typing import Any, Optional

from aiohttp import web

from ..chat_template import ChatTemplate
from ..tools import ToolCallingMatcher, split_reasoning
from ..engine.engine import Engine
from ..engine.sampler import SamplingParams
from ..engine.sequence import Sequence, StopReason
from ..tokenizer import TokenizerWrapper
from . import protocol as P

_FINISH_MAP = {
    StopReason.EOS: "stop",
    StopReason.STOP_TOKEN: "stop",
    StopReason.STOP_STRING: "stop",
    StopReason.LENGTH: "length",
    StopReason.CANCELLED: "abort",
    StopReason.ERROR: "error",
}


class Metrics:
    """Minimal Prometheus text-format counters (metrics.rs analog)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.requests_total: dict[tuple[str, str, int], int] = {}
        self.in_flight = 0
        self.request_seconds_sum = 0.0
        self.request_seconds_count = 0

    def observe(self, method: str, route: str, status: int, dt: float):
        with self.lock:
            key = (method, route, status)
            self.requests_total[key] = self.requests_total.get(key, 0) + 1
            self.request_seconds_sum += dt
            self.request_seconds_count += 1

    def render(self, engine_stats: dict) -> str:
        lines = [
            "# TYPE http_requests_total counter",
        ]
        with self.lock:
            for (m, r, s), v in sorted(self.requests_total.items()):
                lines.append(
                    f'http_requests_total{{method="{m}",route="{r}",status="{s}"}} {v}'
                )
            lines.append("# TYPE http_requests_in_flight gauge")
            lines.append(f"http_requests_in_flight {self.in_flight}")
            lines.append("# TYPE http_request_duration_seconds summary")
            lines.append(f"http_request_duration_seconds_sum {self.request_seconds_sum}")
            lines.append(
                f"http_request_duration_seconds_count {self.request_seconds_count}"
            )
        for k, v in engine_stats.items():
            lines.append(f"# TYPE engine_{k} counter")
            lines.append(f"engine_{k} {v}")
        return "\n".join(lines) + "\n"


class ServerState:
    def __init__(
        self,
        engine: Engine,
        tokenizer: TokenizerWrapper,
        chat_template: ChatTemplate,
        model_id: str = "default",
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.chat_template = chat_template
        self.model_id = model_id
        self.metrics = Metrics()
        self.created = int(time.time())
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self._thread.start()

    def shutdown(self):
        self._stop = True
        self._wake.set()

    def _loop(self):
        while not self._stop:
            if self.engine.has_work:
                try:
                    self.engine.step()
                except Exception as e:  # noqa: BLE001 — keep serving alive
                    # the analog of handle_pipeline_forward_error!: fail the
                    # affected sequences, keep the loop running
                    import traceback

                    traceback.print_exc()
                    for seq in list(self.engine.scheduler.running) + list(
                        self.engine.scheduler.waiting
                    ):
                        seq.finish(StopReason.ERROR)
                        if seq.on_tokens:
                            seq.on_tokens([], True)
                        self.engine.scheduler.release(seq)
            else:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def submit(self, prompt_ids, params: SamplingParams, on_tokens) -> Sequence:
        seq = self.engine.add_request(prompt_ids, params, on_tokens=on_tokens)
        self._wake.set()
        return seq


def _sampling_from_chat(req: P.ChatCompletionRequest, tok: TokenizerWrapper) -> SamplingParams:
    stops = req.stop if isinstance(req.stop, list) else ([req.stop] if req.stop else [])
    bias = {}
    for k, v in (req.logit_bias or {}).items():
        try:
            bias[int(k)] = float(v)
        except ValueError:
            continue
    return SamplingParams(
        temperature=req.temperature if req.temperature is not None else 0.7,
        top_p=req.top_p if req.top_p is not None else 1.0,
        top_k=req.top_k or 0,
        min_p=req.min_p or 0.0,
        frequency_penalty=req.frequency_penalty or 0.0,
        presence_penalty=req.presence_penalty or 0.0,
        repetition_penalty=req.repetition_penalty or 1.0,
        max_tokens=req.max_tokens or req.max_completion_tokens or 512,
        seed=req.seed,
        logit_bias=bias,
        stop_strings=tuple(stops),
        n_logprobs=(req.top_logprobs or 0) if req.logprobs else 0,
    )


class _TokenStream:
    """Bridges engine-thread token callbacks into an asyncio queue."""

    def __init__(self, loop: asyncio.AbstractEventLoop):
        self.loop = loop
        self.queue: asyncio.Queue = asyncio.Queue()

    def on_tokens(self, toks: list[int], finished: bool):
        self.loop.call_soon_threadsafe(self.queue.put_nowait, (list(toks), finished))

    async def drain(self):
        while True:
            toks, fin = await self.queue.get()
            yield toks, fin
            if fin:
                return


def build_app(state: ServerState) -> web.Application:
    app = web.Application()
    routes = web.RouteTableDef()

    @web.middleware
    async def metrics_mw(request: web.Request, handler):
        t0 = time.monotonic()
        state.metrics.in_flight += 1
        try:
            resp = await handler(request)
            status = resp.status
            return resp
        except web.HTTPException as e:
            status = e.status
            raise
        finally:
            state.metrics.in_flight -= 1
            state.metrics.observe(
                request.method, request.path, status if "status" in dir() else 500,
                time.monotonic() - t0,
            )

    app.middlewares.append(metrics_mw)

    @routes.get("/health")
    async def health(_req):
        return web.json_response({"status": "ok"})

    @routes.get("/v1/models")
    async def models(_req):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": state.model_id,
                        "object": "model",
                        "created": state.created,
                        "owned_by": "mistralrs_tpu",
                    }
                ],
            }
        )

    @routes.get("/metrics")
    async def metrics(_req):
        return web.Response(
            text=state.metrics.render(state.engine.stats),
            content_type="text/plain",
        )

    async def _generate_blocking(prompt_ids, params) -> tuple[list[int], Sequence]:
        loop = asyncio.get_running_loop()
        stream = _TokenStream(loop)
        seq = state.submit(prompt_ids, params, stream.on_tokens)
        toks: list[int] = []
        async for chunk, fin in stream.drain():
            toks.extend(chunk)
        return toks, seq

    @routes.post("/v1/chat/completions")
    async def chat_completions(request: web.Request):
        try:
            req = P.ChatCompletionRequest.model_validate(await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": {"message": str(e)}}, status=422)
        msgs = [
            {"role": m.role, "content": m.text_content()} for m in req.messages
        ]
        prompt = state.chat_template.render(msgs, add_generation_prompt=True, tools=req.tools)
        prompt_ids = state.tokenizer.encode(prompt)
        params = _sampling_from_chat(req, state.tokenizer)
        usage_base = {"prompt_tokens": len(prompt_ids)}

        if req.stream:
            return await _stream_chat(request, state, prompt_ids, params, usage_base)

        toks, seq = await _generate_blocking(prompt_ids, params)
        text = state.tokenizer.decode(seq.generated_ids)
        text = _trim_stop_strings(text, params.stop_strings)
        usage = {
            **usage_base,
            "completion_tokens": len(seq.generated_ids),
            "total_tokens": len(prompt_ids) + len(seq.generated_ids),
        }
        if seq.stop_reason == StopReason.ERROR:
            return web.json_response(
                {"error": {"message": "engine error"}}, status=500
            )
        reasoning, content = split_reasoning(text)
        finish = _FINISH_MAP.get(seq.stop_reason, "stop")
        tool_calls = None
        if req.tools and (req.tool_choice or "auto") != "none":
            matcher = ToolCallingMatcher(family=state.engine.cfg.arch
                                         if state.engine.cfg.arch in
                                         ("llama", "mistral", "qwen2", "qwen3",
                                          "gemma2", "gemma3") else "auto")
            calls = matcher.get_calls(content)
            if calls:
                tool_calls = [c.to_openai() for c in calls]
                finish = "tool_calls"
                content = ""
        resp = P.chat_completion_response(state.model_id, content, finish, usage)
        if reasoning:
            resp["choices"][0]["message"]["reasoning_content"] = reasoning
        if tool_calls:
            resp["choices"][0]["message"]["tool_calls"] = tool_calls
            resp["choices"][0]["message"]["content"] = None
        return web.json_response(resp)

    async def _stream_chat(request, state, prompt_ids, params, usage_base):
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            }
        )
        await resp.prepare(request)
        rid = P.gen_id("chatcmpl")
        loop = asyncio.get_running_loop()
        stream = _TokenStream(loop)
        seq = state.submit(prompt_ids, params, stream.on_tokens)
        detok = state.tokenizer.detokenizer()
        first = True
        async for toks, fin in stream.drain():
            delta_text = detok.push(toks) if toks else ""
            if fin:
                delta_text += detok.flush()
            if delta_text or first:
                delta = {"content": delta_text}
                if first:
                    delta["role"] = "assistant"
                    first = False
                chunk = P.chat_chunk(state.model_id, rid, delta)
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            if fin:
                final = P.chat_chunk(
                    state.model_id, rid, {}, _FINISH_MAP.get(seq.stop_reason, "stop")
                )
                await resp.write(f"data: {json.dumps(final)}\n\n".encode())
                await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    @routes.post("/v1/completions")
    async def completions(request: web.Request):
        try:
            req = P.CompletionRequest.model_validate(await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": {"message": str(e)}}, status=422)
        if isinstance(req.prompt, list) and req.prompt and isinstance(req.prompt[0], int):
            prompt_ids = list(req.prompt)
            prompt_text = ""
        else:
            prompt_text = req.prompt if isinstance(req.prompt, str) else req.prompt[0]
            prompt_ids = state.tokenizer.encode(prompt_text)
        stops = req.stop if isinstance(req.stop, list) else ([req.stop] if req.stop else [])
        params = SamplingParams(
            temperature=req.temperature if req.temperature is not None else 1.0,
            top_p=req.top_p if req.top_p is not None else 1.0,
            top_k=req.top_k or 0,
            frequency_penalty=req.frequency_penalty or 0.0,
            presence_penalty=req.presence_penalty or 0.0,
            max_tokens=req.max_tokens or 16,
            seed=req.seed,
            stop_strings=tuple(stops),
        )
        toks, seq = await _generate_blocking(prompt_ids, params)
        text = state.tokenizer.decode(seq.generated_ids)
        text = _trim_stop_strings(text, params.stop_strings)
        if req.echo:
            text = prompt_text + text
        usage = {
            "prompt_tokens": len(prompt_ids),
            "completion_tokens": len(seq.generated_ids),
            "total_tokens": len(prompt_ids) + len(seq.generated_ids),
        }
        return web.json_response(
            P.completion_response(
                state.model_id, text, _FINISH_MAP.get(seq.stop_reason, "stop"), usage
            )
        )

    @routes.post("/v1/messages")
    async def anthropic_messages(request: web.Request):
        try:
            req = P.AnthropicMessagesRequest.model_validate(await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response(
                {"type": "error", "error": {"type": "invalid_request_error", "message": str(e)}},
                status=422,
            )
        msgs = []
        if req.system:
            sys_text = (
                req.system
                if isinstance(req.system, str)
                else "".join(p.get("text", "") for p in req.system)
            )
            msgs.append({"role": "system", "content": sys_text})
        for m in req.messages:
            content = m.get("content")
            if isinstance(content, list):
                content = "".join(
                    p.get("text", "") for p in content if p.get("type") == "text"
                )
            msgs.append({"role": m["role"], "content": content or ""})
        prompt = state.chat_template.render(msgs, add_generation_prompt=True)
        prompt_ids = state.tokenizer.encode(prompt)
        params = SamplingParams(
            temperature=req.temperature if req.temperature is not None else 1.0,
            top_p=req.top_p if req.top_p is not None else 1.0,
            top_k=req.top_k or 0,
            max_tokens=req.max_tokens,
            stop_strings=tuple(req.stop_sequences or ()),
        )
        toks, seq = await _generate_blocking(prompt_ids, params)
        text = _trim_stop_strings(
            state.tokenizer.decode(seq.generated_ids), params.stop_strings
        )
        stop_reason = {
            StopReason.EOS: "end_turn",
            StopReason.STOP_TOKEN: "end_turn",
            StopReason.LENGTH: "max_tokens",
            StopReason.STOP_STRING: "stop_sequence",
        }.get(seq.stop_reason, "end_turn")
        usage = {
            "input_tokens": len(prompt_ids),
            "output_tokens": len(seq.generated_ids),
        }
        return web.json_response(
            P.anthropic_response(state.model_id, text, stop_reason, usage)
        )

    @routes.post("/v1/messages/count_tokens")
    async def count_tokens(request: web.Request):
        body = await request.json()
        msgs = [
            {"role": m["role"], "content": m.get("content") or ""}
            for m in body.get("messages", [])
        ]
        prompt = state.chat_template.render(msgs, add_generation_prompt=True)
        return web.json_response({"input_tokens": len(state.tokenizer.encode(prompt))})

    app.add_routes(routes)
    return app


def _trim_stop_strings(text: str, stops) -> str:
    for s in stops or ():
        idx = text.find(s)
        if idx >= 0:
            text = text[:idx]
    return text


def serve(state: ServerState, host: str = "0.0.0.0", port: int = 8080):
    state.start()
    app = build_app(state)
    web.run_app(app, host=host, port=port, print=lambda s: print(s, flush=True))
