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
from .registry import ModelInstance, ModelRegistry
from . import protocol as P
from . import vlm as vlm_mod

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
    """Server-wide state: a multi-model registry + metrics.

    Back-compat constructor: passing a single (engine, tokenizer, template)
    registers it as the default model (the common single-model deployment).
    """

    def __init__(
        self,
        engine: Optional[Engine] = None,
        tokenizer: Optional[TokenizerWrapper] = None,
        chat_template: Optional[ChatTemplate] = None,
        model_id: str = "default",
        registry: Optional[ModelRegistry] = None,
        vlm=None,
        driver=None,  # parallel/multihost.py LockstepDriver (host 0)
    ):
        self.registry = registry or ModelRegistry()
        self.metrics = Metrics()
        from ..agent import AgentSessionStore

        self.agent_sessions = AgentSessionStore()
        self.created = int(time.time())
        self._started = False
        # non-text generators (route_registry.rs: image_generation /
        # speech_generation routes)
        self.flux = None  # diffusion.pipeline.FluxPipeline
        self.speech = None  # {"params","cfg","dac_params","dac_cfg","sample_rate"}
        # /v1/files store (route_registry.rs files+containers analog)
        self.files: dict[str, dict] = {}
        self._file_counter = 0
        # /v1/skills store (skills.rs analog; lazily created)
        from ..skills import SkillStore

        self.skills = SkillStore()
        # calibration state (re_isq/calibration routes)
        self.calibration: dict = {"status": "idle"}
        if engine is not None:
            self.registry.register(
                ModelInstance(
                    model_id=model_id,
                    engine=engine,
                    tokenizer=tokenizer,
                    chat_template=chat_template,
                    vlm=vlm,
                    driver=driver,
                ),
                default=True,
            )
            self._started = True  # register() starts the instance thread

    # back-compat accessors (default model)
    @property
    def _default(self) -> ModelInstance:
        inst = self.registry.get()
        if inst is None:
            raise RuntimeError("no models loaded")
        return inst

    @property
    def engine(self) -> Engine:
        return self._default.engine

    @property
    def tokenizer(self) -> TokenizerWrapper:
        return self._default.tokenizer

    @property
    def chat_template(self) -> ChatTemplate:
        return self._default.chat_template

    @property
    def model_id(self) -> str:
        return self._default.model_id

    def start(self):
        pass  # instances start when registered

    def shutdown(self):
        self.registry.shutdown()

    def resolve(self, model_id: Optional[str]) -> Optional[ModelInstance]:
        """Route a request's `model` field to a loaded instance: exact id,
        None/default → default model, and (single-model deployments) any name
        maps to the only loaded model (clients often send placeholder names)."""
        inst = self.registry.get(model_id)
        if inst is None and model_id:
            all_insts = self.registry.list()
            if len(all_insts) == 1:
                return all_insts[0]
        return inst

    def submit(self, prompt_ids, params: SamplingParams, on_tokens) -> Sequence:
        return self._default.submit(prompt_ids, params, on_tokens)


def _sampling_from_chat(req: P.ChatCompletionRequest, tok: TokenizerWrapper) -> SamplingParams:
    stops = req.stop if isinstance(req.stop, list) else ([req.stop] if req.stop else [])
    bias = {}
    for k, v in (req.logit_bias or {}).items():
        try:
            bias[int(k)] = float(v)
        except ValueError:
            continue
    constraint = None
    rf = req.response_format or {}
    if rf.get("type") in ("json_object", "json_schema"):
        # json_schema constrains to valid JSON (schema-shape enforcement is
        # a planned llguidance-equivalent refinement)
        constraint = "json_object"
    g = req.grammar or {}
    if g.get("type") == "regex" and g.get("value"):
        constraint = "regex:" + str(g["value"])
    elif g.get("type") == "lark" and g.get("value"):
        constraint = "lark:" + str(g["value"])
    elif g.get("type") == "choice" and g.get("value"):
        from ..grammar import ChoiceConstraint

        constraint = ChoiceConstraint([str(c) for c in g["value"]])
    elif g.get("type") == "json_schema":
        constraint = "json_object"
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
        constraint=constraint,
        dry_multiplier=req.dry_multiplier or 0.0,
        dry_base=req.dry_base if req.dry_base is not None else 1.75,
        dry_allowed_length=(
            req.dry_allowed_length if req.dry_allowed_length is not None else 2
        ),
        dry_sequence_breaker_ids=tuple(req.dry_sequence_breakers or ()),
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

    @routes.get("/")
    async def index(_req):
        from .webui import INDEX_HTML

        return web.Response(text=INDEX_HTML, content_type="text/html")

    @routes.get("/v1/models")
    async def models(_req):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": inst.model_id,
                        "object": "model",
                        "created": state.created,
                        "owned_by": "mistralrs_tpu",
                        "default": inst.model_id == state.registry.default_id,
                    }
                    for inst in state.registry.list()
                ],
            }
        )

    @routes.post("/v1/models/load")
    async def models_load(request: web.Request):
        body = await request.json()
        model_id = body.get("model_id") or body.get("model")
        path = body.get("path")
        if not model_id or not path:
            return web.json_response(
                {"error": {"message": "model_id and path required"}}, status=422
            )
        loop = asyncio.get_running_loop()
        try:
            await loop.run_in_executor(
                None,
                lambda: state.registry.load(
                    model_id, path,
                    default=bool(body.get("default", False)),
                    isq=body.get("isq"),
                    engine_options=body.get("engine_options"),
                ),
            )
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": {"message": str(e)}}, status=400)
        return web.json_response({"status": "loaded", "model_id": model_id})

    @routes.post("/v1/models/unload")
    async def models_unload(request: web.Request):
        body = await request.json()
        ok = state.registry.unload(body.get("model_id") or body.get("model") or "")
        if not ok:
            return web.json_response(
                {"error": {"message": "model not found"}}, status=404
            )
        return web.json_response({"status": "unloaded"})

    @routes.post("/v1/models/reload")
    async def models_reload(request: web.Request):
        body = await request.json()
        loop = asyncio.get_running_loop()
        ok = await loop.run_in_executor(
            None, lambda: state.registry.reload(body.get("model_id") or "")
        )
        if not ok:
            return web.json_response(
                {"error": {"message": "model not found or not reloadable"}},
                status=404,
            )
        return web.json_response({"status": "reloaded"})

    @routes.get("/v1/system/info")
    async def system_info(_req):
        import platform

        import jax

        return web.json_response(
            {
                "backend": jax.default_backend(),
                "devices": [str(d) for d in jax.devices()],
                "platform": platform.platform(),
                "models": [i.model_id for i in state.registry.list()],
            }
        )

    @routes.get("/metrics")
    async def metrics(_req):
        return web.Response(
            text=state.metrics.render(state.engine.stats),
            content_type="text/plain",
        )

    def _resolve_or_404(model_id) -> ModelInstance:
        inst = state.resolve(model_id)
        if inst is None:
            raise web.HTTPNotFound(
                text=json.dumps(
                    {"error": {"message": f"model {model_id!r} not found"}}
                ),
                content_type="application/json",
            )
        return inst

    async def _generate_blocking(
        inst, prompt_ids, params, mm_kwargs=None
    ) -> tuple[list[int], Sequence]:
        loop = asyncio.get_running_loop()
        stream = _TokenStream(loop)
        seq = inst.submit(prompt_ids, params, stream.on_tokens, **(mm_kwargs or {}))
        toks: list[int] = []
        async for chunk, fin in stream.drain():
            toks.extend(chunk)
        return toks, seq

    def _chat_prompt_and_media(inst, req) -> tuple[list[int], dict]:
        """Chat messages → (prompt_ids, engine multimodal kwargs).

        Image parts (data: URIs) are encoded through the model's VLM
        adapter: the placeholder token string is spliced into the chat text
        (one per merged vision token) and the merged prompt embeddings ride
        `Engine.add_request(prompt_embeds=...)` — the analog of the
        reference's vision inputs processors."""
        images: list = []
        kinds: list[str] = []
        msgs: list[dict] = []
        _MEDIA_TYPES = ("image_url", "input_audio", "video_url")
        for m in req.messages:
            content = m.content
            has_media = isinstance(content, list) and any(
                isinstance(p, dict) and p.get("type") in _MEDIA_TYPES
                for p in content
            )
            if not has_media:
                msgs.append({"role": m.role, "content": m.text_content()})
                continue
            if inst.vlm is None:
                raise web.HTTPBadRequest(
                    text=json.dumps({"error": {"message":
                        f"model {inst.model_id!r} does not accept media input"}}),
                    content_type="application/json",
                )
            parts: list = []
            for p in content:
                if p.get("type") == "text":
                    parts.append(p.get("text", ""))
                elif p.get("type") in _MEDIA_TYPES:
                    try:
                        if p["type"] == "image_url":
                            iu = p.get("image_url")
                            url = (
                                iu.get("url", "") if isinstance(iu, dict)
                                else str(iu)
                            )
                            images.append(vlm_mod.decode_image_url(url))
                            kinds.append("image")
                        elif p["type"] == "video_url":
                            # frame extraction + per-frame hashing
                            # (video_input.rs + server-core/src/video.rs)
                            from ..video import decode_video_url

                            vu = p.get("video_url")
                            url = (
                                vu.get("url", "") if isinstance(vu, dict)
                                else str(vu)
                            )
                            nf = (vu.get("num_frames")
                                  if isinstance(vu, dict) else None)
                            if not getattr(inst.vlm, "supports_video", False):
                                raise ValueError(
                                    f"model {inst.model_id!r} does not "
                                    "accept video input"
                                )
                            images.append(decode_video_url(
                                url, **({"num_frames": int(nf)}
                                        if nf else {})
                            ))
                            kinds.append("video")
                        else:  # input_audio (voxtral/phi4mm audio)
                            ia = p.get("input_audio") or {}
                            images.append(vlm_mod.decode_audio(
                                ia.get("data", ""), ia.get("format", "wav")
                            ))
                            kinds.append("audio")
                    except ValueError as e:
                        raise web.HTTPBadRequest(
                            text=json.dumps({"error": {"message": str(e)}}),
                            content_type="application/json",
                        )
                    parts.append(None)  # placeholder: expanded after process()
            msgs.append({"role": m.role, "content": parts})
        mm_kwargs: dict = {}
        if images:
            media = inst.vlm.process(images)
            items = iter(zip(kinds, media.counts))

            def _expand_next():
                kind, count = next(items)
                return inst.vlm.expand_media(kind, count)

            for m in msgs:
                if isinstance(m["content"], list):
                    m["content"] = "".join(
                        s if s is not None else _expand_next()
                        for s in m["content"]
                    )
        prompt = inst.chat_template.render(
            msgs, add_generation_prompt=True, tools=req.tools
        )
        prompt_ids = inst.tokenizer.encode(prompt)
        if images:
            mm_kwargs = inst.vlm.prepare(prompt_ids, media)
        return prompt_ids, mm_kwargs

    @routes.post("/v1/chat/completions")
    async def chat_completions(request: web.Request):
        try:
            req = P.ChatCompletionRequest.model_validate(await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": {"message": str(e)}}, status=422)
        inst = _resolve_or_404(req.model)
        prompt_ids, mm_kwargs = _chat_prompt_and_media(inst, req)
        if req.adapters:
            mm_kwargs["lora"] = req.adapters[0]
        params = _sampling_from_chat(req, inst.tokenizer)
        usage_base = {"prompt_tokens": len(prompt_ids)}

        if req.stream:
            return await _stream_chat(
                request, inst, prompt_ids, params, usage_base, mm_kwargs
            )

        toks, seq = await _generate_blocking(inst, prompt_ids, params, mm_kwargs)
        text = inst.tokenizer.decode(seq.generated_ids)
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
        logprobs_out = None
        if req.logprobs and seq.output_top_logprobs:
            logprobs_out = {
                "content": [
                    {
                        "token": inst.tokenizer.decode([t]),
                        "logprob": lp,
                        "top_logprobs": [
                            {"token": inst.tokenizer.decode([i]), "logprob": v}
                            for i, v in tops.items()
                        ],
                    }
                    for t, lp, tops in zip(
                        seq.generated_ids, seq.output_logprobs,
                        seq.output_top_logprobs,
                    )
                ]
            }
        tool_calls = None
        if req.tools and (req.tool_choice or "auto") != "none":
            matcher = ToolCallingMatcher(family=inst.engine.cfg.arch
                                         if inst.engine.cfg.arch in
                                         ("llama", "mistral", "qwen2", "qwen3",
                                          "gemma2", "gemma3") else "auto")
            calls = matcher.get_calls(content)
            if calls:
                tool_calls = [c.to_openai() for c in calls]
                finish = "tool_calls"
                content = ""
        resp = P.chat_completion_response(
            inst.model_id, content, finish, usage, logprobs=logprobs_out
        )
        if reasoning:
            resp["choices"][0]["message"]["reasoning_content"] = reasoning
        if tool_calls:
            resp["choices"][0]["message"]["tool_calls"] = tool_calls
            resp["choices"][0]["message"]["content"] = None
        return web.json_response(resp)

    async def _stream_chat(request, inst, prompt_ids, params, usage_base,
                           mm_kwargs=None):
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
        seq = inst.submit(prompt_ids, params, stream.on_tokens,
                          **(mm_kwargs or {}))
        detok = inst.tokenizer.detokenizer()
        first = True
        # stop-string holdback (the reference's held-back streaming): never
        # emit text that could be (part of) a stop string; trim on match
        stops = list(params.stop_strings or ())
        holdback = max((len(s) for s in stops), default=1) - 1
        pending = ""
        stopped = False

        async def write_delta(text, force=False):
            nonlocal first
            if text or (first and force):
                delta = {"content": text}
                if first:
                    delta["role"] = "assistant"
                    first = False
                chunk = P.chat_chunk(inst.model_id, rid, delta)
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())

        async for toks, fin in stream.drain():
            delta_text = detok.push(toks) if toks else ""
            if fin:
                delta_text += detok.flush()
            if not stopped:
                pending += delta_text
                cut = min(
                    (i for i in (pending.find(s) for s in stops) if i >= 0),
                    default=-1,
                )
                if cut >= 0:
                    await write_delta(pending[:cut], force=True)
                    pending = ""
                    stopped = True
                elif fin:
                    await write_delta(pending, force=True)
                    pending = ""
                elif holdback and len(pending) > holdback:
                    await write_delta(pending[:-holdback])
                    pending = pending[-holdback:]
                elif not holdback:
                    await write_delta(pending)
                    pending = ""
            if fin:
                if first:
                    await write_delta("", force=True)
                final = P.chat_chunk(
                    inst.model_id, rid, {}, _FINISH_MAP.get(seq.stop_reason, "stop")
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
        inst = _resolve_or_404(req.model)
        if isinstance(req.prompt, list) and req.prompt and isinstance(req.prompt[0], int):
            prompt_ids = list(req.prompt)
            prompt_text = ""
        else:
            prompt_text = req.prompt if isinstance(req.prompt, str) else req.prompt[0]
            prompt_ids = inst.tokenizer.encode(prompt_text)
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
        toks, seq = await _generate_blocking(inst, prompt_ids, params)
        text = inst.tokenizer.decode(seq.generated_ids)
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
                inst.model_id, text, _FINISH_MAP.get(seq.stop_reason, "stop"), usage
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
        inst = _resolve_or_404(req.model)
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
        prompt = inst.chat_template.render(msgs, add_generation_prompt=True)
        prompt_ids = inst.tokenizer.encode(prompt)
        params = SamplingParams(
            temperature=req.temperature if req.temperature is not None else 1.0,
            top_p=req.top_p if req.top_p is not None else 1.0,
            top_k=req.top_k or 0,
            max_tokens=req.max_tokens,
            stop_strings=tuple(req.stop_sequences or ()),
        )
        toks, seq = await _generate_blocking(inst, prompt_ids, params)
        text = _trim_stop_strings(
            inst.tokenizer.decode(seq.generated_ids), params.stop_strings
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
            P.anthropic_response(inst.model_id, text, stop_reason, usage)
        )

    @routes.post("/v1/embeddings")
    async def embeddings_route(request: web.Request):
        body = await request.json()
        inst = _resolve_or_404(body.get("model"))
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        if not isinstance(inputs, list):
            return web.json_response(
                {"error": {"message": "input must be string or list"}}, status=422
            )
        if inputs and isinstance(inputs[0], int):
            batches = [list(inputs)]
        elif inputs and isinstance(inputs[0], list):
            batches = [list(x) for x in inputs]
        else:
            batches = [inst.tokenizer.encode(t) for t in inputs]
        from ..embeddings import embed as _embed

        loop = asyncio.get_running_loop()
        vecs = await loop.run_in_executor(
            None,
            lambda: _embed(
                inst.engine.weights, inst.engine.cfg, batches,
                pooling=body.get("pooling", "last"),
            ),
        )
        n_tok = sum(len(b_) for b_ in batches)
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {"object": "embedding", "index": i, "embedding": v.tolist()}
                    for i, v in enumerate(vecs)
                ],
                "model": inst.model_id,
                "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
            }
        )

    # -- /v1/responses (OpenAI Responses API subset; cached_responses.rs
    # analog: responses persist in-memory for later GET/DELETE) -------------

    _responses_store: dict[str, dict] = {}

    @routes.post("/v1/responses")
    async def responses_create(request: web.Request):
        body = await request.json()
        inst = _resolve_or_404(body.get("model"))
        inp = body.get("input", "")
        if isinstance(inp, str):
            msgs = [{"role": "user", "content": inp}]
        else:
            msgs = [
                {"role": m.get("role", "user"),
                 "content": m.get("content", "") if isinstance(m.get("content"), str)
                 else "".join(p.get("text", "") for p in m.get("content", []))}
                for m in inp
            ]
        if body.get("instructions"):
            msgs = [{"role": "system", "content": body["instructions"]}] + msgs
        prompt = inst.chat_template.render(msgs, add_generation_prompt=True)
        prompt_ids = inst.tokenizer.encode(prompt)
        params = SamplingParams(
            temperature=body.get("temperature", 1.0),
            top_p=body.get("top_p", 1.0),
            max_tokens=body.get("max_output_tokens", 512),
        )
        toks, seq = await _generate_blocking(inst, prompt_ids, params)
        text = inst.tokenizer.decode(seq.generated_ids)
        rid = P.gen_id("resp")
        resp = {
            "id": rid,
            "object": "response",
            "created_at": P.now(),
            "model": inst.model_id,
            "status": "completed",
            "output": [
                {
                    "type": "message",
                    "id": P.gen_id("msg"),
                    "role": "assistant",
                    "content": [{"type": "output_text", "text": text}],
                }
            ],
            "usage": {
                "input_tokens": len(prompt_ids),
                "output_tokens": len(seq.generated_ids),
                "total_tokens": len(prompt_ids) + len(seq.generated_ids),
            },
        }
        if body.get("store", True):
            _responses_store[rid] = resp
        return web.json_response(resp)

    @routes.get("/v1/responses/{rid}")
    async def responses_get(request: web.Request):
        rid = request.match_info["rid"]
        resp = _responses_store.get(rid)
        if resp is None:
            return web.json_response(
                {"error": {"message": "response not found"}}, status=404
            )
        return web.json_response(resp)

    @routes.delete("/v1/responses/{rid}")
    async def responses_delete(request: web.Request):
        rid = request.match_info["rid"]
        if _responses_store.pop(rid, None) is None:
            return web.json_response(
                {"error": {"message": "response not found"}}, status=404
            )
        return web.json_response({"id": rid, "deleted": True})

    @routes.post("/v1/messages/count_tokens")
    async def count_tokens(request: web.Request):
        body = await request.json()
        inst = _resolve_or_404(body.get("model"))
        msgs = [
            {"role": m["role"], "content": m.get("content") or ""}
            for m in body.get("messages", [])
        ]
        prompt = inst.chat_template.render(msgs, add_generation_prompt=True)
        return web.json_response({"input_tokens": len(inst.tokenizer.encode(prompt))})

    # -- non-text generation (route_registry.rs:27-107 image/speech) --------

    @routes.post("/v1/images/generations")
    async def images_generations(request: web.Request):
        """OpenAI images API over the FLUX diffusion pipeline."""
        if state.flux is None:
            return web.json_response(
                {"error": {"message": "no diffusion model loaded"}}, status=400
            )
        body = await request.json()
        prompt = body.get("prompt") or ""
        n = int(body.get("n", 1))
        size = body.get("size") or "1024x1024"
        try:
            w, h = (int(v) for v in size.lower().split("x"))
        except ValueError:
            return web.json_response(
                {"error": {"message": f"bad size {size!r} (want WxH)"}},
                status=400,
            )
        steps = int(body.get("steps", body.get("num_inference_steps", 4)))
        seed = int(body.get("seed", 0))

        def run():
            import base64
            import io

            txt, pooled = state.flux.encode_prompt(prompt)
            images = []
            for i in range(n):
                img = state.flux.generate(
                    txt, pooled, height=h, width=w, num_steps=steps,
                    seed=seed + i,
                )[0]
                buf = io.BytesIO()
                _write_png(buf, img)
                images.append(
                    {"b64_json": base64.b64encode(buf.getvalue()).decode()}
                )
            return images

        images = await asyncio.get_event_loop().run_in_executor(None, run)
        return web.json_response({"created": int(time.time()), "data": images})

    @routes.post("/v1/audio/speech")
    async def audio_speech(request: web.Request):
        """OpenAI speech API over the Dia TTS model + DAC vocoder."""
        if state.speech is None:
            return web.json_response(
                {"error": {"message": "no speech model loaded"}}, status=400
            )
        body = await request.json()
        text = body.get("input") or ""
        temperature = float(body.get("temperature", 0.0))
        max_tokens = int(body.get("max_tokens", 1024))

        def run():
            import io

            import numpy as np

            from ..audio.dac import dac_decode_codes
            from ..audio.wav import write_wav
            from ..models.dia import dia_tts

            sp = state.speech
            codes = dia_tts(
                sp["params"], sp["cfg"], text,
                max_tokens=max_tokens, temperature=temperature,
            )
            if codes.shape[0] == 0:
                samples = np.zeros((1,), np.float32)
            else:
                import jax.numpy as jnp

                samples = np.asarray(
                    dac_decode_codes(
                        sp["dac_params"], sp["dac_cfg"],
                        jnp.asarray(codes.T[None], jnp.int32),
                    )
                ).reshape(-1)
            rate = sp.get("sample_rate", 44100)
            if samples.size > 1:
                from ..audio.bs1770 import normalize_loudness

                # the reference normalizes TTS output to −14 LUFS
                # (speech_models/utils.rs normalize_loudness)
                samples = normalize_loudness(samples, rate)
            buf = io.BytesIO()
            write_wav(buf, samples, sample_rate=rate)
            return buf.getvalue()

        wav = await asyncio.get_event_loop().run_in_executor(None, run)
        return web.Response(body=wav, content_type="audio/wav")

    # -- dynamic LoRA management (adapter/selection.rs analogs) -------------

    @routes.get("/v1/lora")
    async def lora_list(request: web.Request):
        out = []
        for inst in state.registry.list():
            targets = sorted(
                k[: -len("_lora")]
                for k in inst.engine.weights.get("layers", {})
                if k.endswith("_lora")
            )
            out.append({
                "model": inst.model_id,
                "adapters": list(inst.engine.lora_names),
                "attached_targets": targets,
            })
        return web.json_response({"data": out})

    def _reattach_bank(inst):
        from ..lora import attach_adapter_bank, detach_dynamic_lora

        bank = getattr(inst, "_lora_bank", [])
        weights = detach_dynamic_lora(inst.engine.weights)
        if bank:
            weights = attach_adapter_bank(
                weights, bank, inst.engine.cfg.num_layers,
                dtype=inst.engine.compute_dtype, cfg=inst.engine.cfg,
            )
            inst.engine.lora_names = tuple(weights.pop("lora_names"))
        else:
            inst.engine.lora_names = ()
        inst.engine.weights = weights

    @routes.post("/v1/lora/load")
    async def lora_load(request: web.Request):
        """Load a named adapter into the model's bank — requests then select
        it with the `adapters` field (adapter/selection.rs analog)."""
        body = await request.json()
        inst = _resolve_or_404(body.get("model"))
        path = body.get("path")
        if not path:
            return web.json_response(
                {"error": {"message": "path required"}}, status=400
            )
        name = body.get("name") or path.rstrip("/").rsplit("/", 1)[-1]

        def run():
            from ..lora import load_adapter

            cfg, adapter = load_adapter(path)
            bank = [
                e for e in getattr(inst, "_lora_bank", []) if e[0] != name
            ]
            bank.append((name, cfg, adapter))
            inst._lora_bank = bank
            _reattach_bank(inst)

        await asyncio.get_event_loop().run_in_executor(None, run)
        return web.json_response(
            {"status": "ok", "model": inst.model_id, "name": name,
             "adapters": list(inst.engine.lora_names)}
        )

    @routes.post("/v1/lora/unload")
    async def lora_unload(request: web.Request):
        body = await request.json()
        inst = _resolve_or_404(body.get("model"))
        name = body.get("name")
        bank = getattr(inst, "_lora_bank", [])
        inst._lora_bank = (
            [] if name is None else [e for e in bank if e[0] != name]
        )
        _reattach_bank(inst)
        return web.json_response(
            {"status": "ok", "model": inst.model_id,
             "adapters": list(inst.engine.lora_names)}
        )

    # -- agent sessions (agentic_session.rs analogs) -------------------------

    @routes.get("/v1/agent/sessions")
    async def agent_sessions(_req):
        return web.json_response({"data": state.agent_sessions.list_ids()})

    @routes.get("/v1/agent/sessions/{sid}")
    async def agent_session_get(request: web.Request):
        msgs = state.agent_sessions.get(request.match_info["sid"])
        if msgs is None:
            return web.json_response(
                {"error": {"message": "no such session"}}, status=404
            )
        return web.json_response({"messages": msgs})

    @routes.delete("/v1/agent/sessions/{sid}")
    async def agent_session_delete(request: web.Request):
        ok = state.agent_sessions.delete(request.match_info["sid"])
        return web.json_response({"deleted": ok}, status=200 if ok else 404)

    @routes.post("/v1/agent/sessions/{sid}/approve")
    async def agent_session_approve(request: web.Request):
        state.agent_sessions.approve(request.match_info["sid"])
        return web.json_response({"approved": True})

    @routes.post("/v1/agent/sessions/{sid}/fork")
    async def agent_session_fork(request: web.Request):
        body = await request.json()
        try:
            state.agent_sessions.fork(
                request.match_info["sid"], str(body["dest"]),
                int(body.get("num_turns", 1)),
            )
        except KeyError:
            return web.json_response(
                {"error": {"message": "no such session"}}, status=404
            )
        return web.json_response({"forked": body["dest"]})

    # -- files (route_registry.rs /v1/files + containers analog) -------------

    @routes.post("/v1/files")
    async def files_upload(request: web.Request):
        body = await request.json()
        if "filename" not in body or "content_b64" not in body:
            return web.json_response(
                {"error": {"message": "filename and content_b64 required"}},
                status=422,
            )
        import base64

        try:
            data = base64.b64decode(body["content_b64"])
        except Exception:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": "invalid base64"}}, status=422
            )
        state._file_counter += 1
        fid = f"file-{state._file_counter}"
        state.files[fid] = {
            "id": fid, "object": "file", "filename": body["filename"],
            "bytes": len(data), "created_at": int(time.time()),
            "purpose": body.get("purpose", "assistants"), "_data": data,
        }
        return web.json_response(
            {k: v for k, v in state.files[fid].items() if k != "_data"}
        )

    @routes.get("/v1/files")
    async def files_list(_req):
        return web.json_response({
            "object": "list",
            "data": [
                {k: v for k, v in f.items() if k != "_data"}
                for f in state.files.values()
            ],
        })

    @routes.get("/v1/files/{fid}")
    async def files_get(request: web.Request):
        f = state.files.get(request.match_info["fid"])
        if f is None:
            return web.json_response(
                {"error": {"message": "no such file"}}, status=404
            )
        return web.json_response({k: v for k, v in f.items() if k != "_data"})

    @routes.get("/v1/files/{fid}/content")
    async def files_content(request: web.Request):
        f = state.files.get(request.match_info["fid"])
        if f is None:
            return web.json_response(
                {"error": {"message": "no such file"}}, status=404
            )
        return web.Response(
            body=f["_data"], content_type="application/octet-stream"
        )

    @routes.delete("/v1/files/{fid}")
    async def files_delete(request: web.Request):
        ok = state.files.pop(request.match_info["fid"], None) is not None
        return web.json_response(
            {"deleted": ok, "id": request.match_info["fid"]},
            status=200 if ok else 404,
        )

    # -- skills (route_registry.rs /v1/skills + skills.rs analog) ------------

    @routes.get("/v1/skills")
    async def skills_list(_req):
        return web.json_response(
            {"object": "list", "data": state.skills.list()}
        )

    @routes.post("/v1/skills")
    async def skills_upload(request: web.Request):
        """Zip body (application/zip) or JSON {"name", "files": {path:
        text|{"b64": ...}}} — both become a versioned skill."""
        name = request.query.get("name")
        try:
            if request.content_type in ("application/zip",
                                        "application/octet-stream"):
                data = await request.read()
            else:
                body = await request.json()
                from ..skills import zip_skill

                name = name or body.get("name")
                files = {}
                for rel, content in (body.get("files") or {}).items():
                    if isinstance(content, dict):
                        import base64

                        files[rel] = base64.b64decode(content["b64"])
                    else:
                        files[rel] = content
                data = zip_skill(files)
            return web.json_response(state.skills.upload(data, name=name))
        except (ValueError, KeyError) as e:
            return web.json_response(
                {"error": {"message": str(e)}}, status=422
            )

    @routes.get("/v1/skills/{sid}")
    async def skills_get(request: web.Request):
        obj = state.skills.get(request.match_info["sid"])
        if obj is None:
            return web.json_response(
                {"error": {"message": "no such skill"}}, status=404
            )
        return web.json_response(obj)

    @routes.delete("/v1/skills/{sid}")
    async def skills_delete(request: web.Request):
        ok = state.skills.delete(request.match_info["sid"])
        return web.json_response(
            {"deleted": ok, "id": request.match_info["sid"]},
            status=200 if ok else 404,
        )

    @routes.get("/v1/skills/{sid}/versions")
    async def skills_versions(request: web.Request):
        vs = state.skills.versions(request.match_info["sid"])
        if vs is None:
            return web.json_response(
                {"error": {"message": "no such skill"}}, status=404
            )
        return web.json_response({"object": "list", "data": vs})

    # -- re-ISQ + calibration (re_isq / calibration_* route analogs) ---------

    @routes.post("/re_isq")
    async def re_isq(request: web.Request):
        """Requantize a served model: reload its source checkpoint with a
        new ISQ type (+ the last applied imatrix, if any)."""
        body = await request.json()
        inst = state.registry.get(body.get("model_id") or body.get("model"))
        if inst is None:
            return web.json_response(
                {"error": {"message": "model not found"}}, status=404
            )
        if inst.source is None:
            return web.json_response(
                {"error": {"message": "model has no reloadable source"}},
                status=409,
            )
        isq = body.get("isq")
        if not isq:
            return web.json_response(
                {"error": {"message": "isq required"}}, status=422
            )
        opts = dict(inst.load_options)
        loop = asyncio.get_running_loop()
        try:
            await loop.run_in_executor(
                None,
                lambda: state.registry.load(
                    inst.model_id, inst.source, isq=isq,
                    engine_options=opts.get("engine_options"),
                    imatrix=body.get("imatrix", opts.get("imatrix")),
                ),
            )
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": {"message": str(e)}}, status=400)
        return web.json_response({"status": "requantized", "isq": isq})

    @routes.post("/v1/calibration/start")
    async def calibration_start(request: web.Request):
        """Collect an importance matrix over calibration texts against the
        served model's weights (imatrix.py collector)."""
        body = await request.json()
        inst = state.registry.get(body.get("model_id") or body.get("model"))
        if inst is None:
            return web.json_response(
                {"error": {"message": "model not found"}}, status=404
            )
        texts = body.get("texts") or []
        if not texts or inst.tokenizer is None:
            return web.json_response(
                {"error": {"message": "texts required (and a tokenizer)"}},
                status=422,
            )
        if state.calibration.get("status") == "running":
            return web.json_response(
                {"error": {"message": "calibration already running"}},
                status=409,
            )
        from ..models.config import ModelConfig

        if not isinstance(inst.engine.cfg, ModelConfig):
            return web.json_response(
                {"error": {"message": "calibration: llama-family models only"}},
                status=409,
            )
        state.calibration = {"status": "running", "tokens": 0,
                             "model_id": inst.model_id}

        def run():
            import numpy as np

            from ..imatrix import ImatrixCollector

            try:
                coll = ImatrixCollector(inst.engine.cfg)
                chunk = int(body.get("chunk_tokens", 512))
                for text in texts:
                    ids = inst.tokenizer.encode(text)
                    for s in range(0, max(len(ids) - 1, 1), chunk):
                        piece = ids[s : s + chunk]
                        if len(piece) < 2:
                            continue
                        coll.update(
                            inst.engine.weights,
                            np.asarray([piece], np.int32),
                        )
                        state.calibration["tokens"] = coll.tokens
                state.calibration["_imatrix"] = coll.finalize()
                state.calibration["status"] = "done"
            except Exception as e:  # noqa: BLE001
                state.calibration["status"] = "error"
                state.calibration["error"] = f"{type(e).__name__}: {e}"

        import threading

        threading.Thread(target=run, daemon=True).start()
        return web.json_response({"status": "running"})

    @routes.get("/v1/calibration/status")
    async def calibration_status(_req):
        return web.json_response(
            {k: v for k, v in state.calibration.items() if not k.startswith("_")}
        )

    @routes.post("/v1/calibration/apply")
    async def calibration_apply(request: web.Request):
        """Save the collected imatrix and requantize the model with it."""
        body = await request.json()
        if state.calibration.get("status") != "done":
            return web.json_response(
                {"error": {"message": "no finished calibration"}}, status=409
            )
        inst = state.registry.get(
            body.get("model_id") or state.calibration.get("model_id")
        )
        if inst is None or inst.source is None:
            return web.json_response(
                {"error": {"message": "model not found or not reloadable"}},
                status=404,
            )
        import tempfile

        from ..imatrix import save_imatrix

        path = body.get("save_path") or tempfile.mktemp(suffix=".imatrix.npz")
        save_imatrix(path, state.calibration["_imatrix"])
        isq = body.get("isq") or inst.load_options.get("isq")
        loop = asyncio.get_running_loop()
        try:
            await loop.run_in_executor(
                None,
                lambda: state.registry.load(
                    inst.model_id, inst.source, isq=isq,
                    engine_options=inst.load_options.get("engine_options"),
                    imatrix=path,
                ),
            )
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": {"message": str(e)}}, status=400)
        return web.json_response(
            {"status": "applied", "imatrix_path": path, "isq": isq}
        )

    @routes.get("/v1/system/doctor")
    async def system_doctor(_req):
        import platform

        import jax

        checks = {"python": platform.python_version(), "jax": jax.__version__}
        try:
            devs = jax.devices()
            checks["backend"] = jax.default_backend()
            checks["devices"] = [str(d) for d in devs]
            checks["device_ok"] = True
        except Exception as e:  # noqa: BLE001
            checks["device_ok"] = False
            checks["device_error"] = str(e)
        for mod in ("flax", "optax", "transformers"):
            try:
                checks[mod] = __import__(mod).__version__
            except Exception:  # noqa: BLE001
                checks[mod] = None
        checks["models"] = [i.model_id for i in state.registry.list()]
        return web.json_response(checks)

    app.add_routes(routes)
    return app


def _write_png(buf, img) -> None:
    """Minimal PNG writer (RGB8) — no imaging dependency in the image."""
    import struct
    import zlib

    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    buf.write(b"\x89PNG\r\n\x1a\n")
    buf.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
    buf.write(chunk(b"IDAT", zlib.compress(raw, 6)))
    buf.write(chunk(b"IEND", b""))


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
