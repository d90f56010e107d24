"""Multi-model runtime registry (the analog of `MistralRs`,
`mistralrs-core/src/lib.rs:416`: named `EngineInstance`s with their own
engine threads, request routing by model id, load/unload/reload at runtime).
"""

from __future__ import annotations

import threading
import traceback
from dataclasses import dataclass, field
from typing import Any, Optional

from ..chat_template import ChatTemplate
from ..engine.engine import Engine
from ..engine.sampler import SamplingParams
from ..engine.sequence import Sequence, StopReason
from ..tokenizer import TokenizerWrapper


@dataclass
class ModelInstance:
    """One loaded model: engine + its worker thread (EngineInstance analog)."""

    model_id: str
    engine: Engine
    tokenizer: Optional[TokenizerWrapper]
    chat_template: ChatTemplate
    source: Optional[str] = None  # path, for reload
    load_options: dict[str, Any] = field(default_factory=dict)
    vlm: Optional[Any] = None  # serving/vlm.py VlmAdapter (image inputs)
    # multi-host lockstep driver (parallel/multihost.py LockstepDriver):
    # when set, stepping and admission replicate to worker hosts so every
    # rank's scheduler sees the identical request stream
    driver: Optional[Any] = None
    _wake: threading.Event = field(default_factory=threading.Event)
    _stop: bool = False
    _thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def shutdown(self):
        self._stop = True
        self._wake.set()

    @property
    def is_alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def _loop(self):
        import os
        import time

        # throughput interval logger (the reference's engine IntervalLogger)
        interval = float(os.environ.get("MRSTPU_LOG_INTERVAL", "10"))
        last_log = time.monotonic()
        last = {"generated_tokens": 0, "prompt_tokens": 0,
                "prefix_cache_hit_tokens": 0,
                "decode_time_s": 0.0, "decode_steps": 0}
        while not self._stop:
            if self.engine.has_work:
                try:
                    if self.driver is not None:
                        self.driver.step()
                    else:
                        self.engine.step()
                except Exception:  # noqa: BLE001 — keep the engine alive
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
            if interval > 0:
                now = time.monotonic()
                if now - last_log >= interval:
                    st = self.engine.stats
                    dg = st.get("generated_tokens", 0) - last["generated_tokens"]
                    dp = st.get("prompt_tokens", 0) - last["prompt_tokens"]
                    if dg or dp:
                        dt = now - last_log
                        dhit = (st.get("prefix_cache_hit_tokens", 0)
                                - last["prefix_cache_hit_tokens"])
                        hit_rate = dhit / max(dp + dhit, 1)
                        dsteps = (st.get("decode_steps", 0)
                                  - last["decode_steps"])
                        dstep_ms = (
                            (st.get("decode_time_s", 0.0)
                             - last["decode_time_s"]) / dsteps * 1e3
                            if dsteps else 0.0
                        )
                        print(
                            f"[{self.model_id}] {dg / dt:.1f} tok/s decode, "
                            f"{dp / dt:.1f} tok/s prefill, "
                            f"{dstep_ms:.1f} ms/step, "
                            f"prefix-hit {hit_rate:.0%}, "
                            f"{len(self.engine.scheduler.running)} running, "
                            f"{len(self.engine.scheduler.waiting)} waiting",
                            flush=True,
                        )
                        last = {
                            "generated_tokens": st.get("generated_tokens", 0),
                            "prompt_tokens": st.get("prompt_tokens", 0),
                            "prefix_cache_hit_tokens": st.get(
                                "prefix_cache_hit_tokens", 0),
                            "decode_time_s": st.get("decode_time_s", 0.0),
                            "decode_steps": st.get("decode_steps", 0),
                        }
                    last_log = now

    def submit(self, prompt_ids, params: SamplingParams, on_tokens,
               **mm_kwargs) -> Sequence:
        if not self.is_alive and not self._stop:
            # dead-engine-thread reboot (the analog of the reference's
            # `RebootState`, lib.rs:432): the engine object survives — only
            # the stepping thread is restarted
            self.start()
        if self.driver is not None:
            import uuid

            from ..parallel.multihost import encode_params, encode_payload

            rid = f"mh-{uuid.uuid4().hex[:12]}"
            req = {"request_id": rid, "prompt_ids": list(prompt_ids),
                   "params": encode_params(params)}
            if mm_kwargs:
                # media tensors (merged embeds, M-RoPE, DeepStack, adapter
                # state) replicate to every rank — the SPMD forward needs
                # identical inputs on all hosts (reference replicates full
                # multimodal requests to daemons, distributed.rs:174)
                req["mm"] = {
                    k: encode_payload(v) for k, v in mm_kwargs.items()
                }
            seq = self.driver.submit(
                req, list(prompt_ids), params, on_tokens=on_tokens,
                **mm_kwargs,
            )
        else:
            seq = self.engine.add_request(
                prompt_ids, params, on_tokens=on_tokens, **mm_kwargs
            )
        self._wake.set()
        return seq


class ModelRegistry:
    """Thread-safe named-model registry with a default model."""

    def __init__(self):
        self._lock = threading.Lock()
        self._models: dict[str, ModelInstance] = {}
        self._default: Optional[str] = None

    def register(self, inst: ModelInstance, default: bool = False) -> None:
        with self._lock:
            old = self._models.get(inst.model_id)
            self._models[inst.model_id] = inst
            if default or self._default is None:
                self._default = inst.model_id
        if old is not None:
            old.shutdown()
        inst.start()

    def load(
        self,
        model_id: str,
        path: str,
        *,
        default: bool = False,
        isq: Optional[str] = None,
        engine_options: Optional[dict[str, Any]] = None,
        imatrix: Optional[str] = None,
    ) -> ModelInstance:
        """Load a model from disk and register it (the /v1/models/load analog)."""
        from ..pipeline import load_pipeline, make_adapter

        pipe = load_pipeline(path, isq=isq, imatrix=imatrix)
        adapter = make_adapter(pipe.cfg, pipe.weights)
        engine = Engine(pipe.cfg, pipe.weights, adapter=adapter,
                        **(engine_options or {}))
        inst = ModelInstance(
            model_id=model_id,
            engine=engine,
            tokenizer=pipe.tokenizer,
            chat_template=pipe.chat_template,
            source=path,
            load_options={"isq": isq, "engine_options": engine_options or {},
                          "imatrix": imatrix},
        )
        self.register(inst, default=default)
        return inst

    def unload(self, model_id: str) -> bool:
        with self._lock:
            inst = self._models.pop(model_id, None)
            if self._default == model_id:
                self._default = next(iter(self._models), None)
        if inst is None:
            return False
        inst.shutdown()
        return True

    def reload(self, model_id: str) -> bool:
        with self._lock:
            inst = self._models.get(model_id)
        if inst is None or inst.source is None:
            return False
        opts = inst.load_options
        self.load(
            model_id, inst.source,
            isq=opts.get("isq"), engine_options=opts.get("engine_options"),
            imatrix=opts.get("imatrix"),
        )
        return True

    def get(self, model_id: Optional[str] = None) -> Optional[ModelInstance]:
        with self._lock:
            if model_id in (None, "", "default"):
                model_id = self._default
            return self._models.get(model_id) if model_id else None

    def list(self) -> list[ModelInstance]:
        with self._lock:
            return list(self._models.values())

    @property
    def default_id(self) -> Optional[str]:
        with self._lock:
            return self._default

    def shutdown(self):
        for inst in self.list():
            inst.shutdown()
