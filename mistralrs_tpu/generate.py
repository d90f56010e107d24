"""Single-shot generation driver — the minimal end-to-end slice
(SURVEY.md §7 phase 3). The serving engine (`engine/`) supersedes this for
batched/continuous workloads; this stays as the simple library entry point
(analog of the reference SDK's one-off `send_chat_request`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.llama import KVCache, forward


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "compute_dtype"))
def _prefill_step(weights, cfg, ids, cache, backend, compute_dtype):
    b, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    kv_start = jnp.zeros((b,), jnp.int32)
    logits, cache = forward(
        weights, cfg, ids, positions, cache, kv_start,
        backend=backend, logits_last_only=True, compute_dtype=compute_dtype,
    )
    return logits[:, -1, :], cache


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "compute_dtype"))
def _decode_step(weights, cfg, token, pos, cache, backend, compute_dtype):
    b = token.shape[0]
    positions = pos[:, None]
    logits, cache = forward(
        weights, cfg, token[:, None], positions, cache, pos,
        backend=backend, logits_last_only=True, compute_dtype=compute_dtype,
    )
    return logits[:, -1, :], cache


def generate(
    weights: dict,
    cfg: ModelConfig,
    prompt_ids: list[int] | np.ndarray,
    *,
    max_new_tokens: int = 64,
    temperature: float = 0.0,
    seed: int = 0,
    backend: Optional[str] = None,
    stop_tokens: Optional[set[int]] = None,
    kv_capacity: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    cache_type: str = "normal",  # "normal" | "rotating" (uniform sliding
    # ring) | "hybrid" (per-layer window mix: full pools + ring pools,
    # kv_cache/hybrid_cache.rs analog)
) -> list[int]:
    """Greedy / temperature sampling for a single sequence. Returns new tokens."""
    ids = np.asarray(prompt_ids, np.int32)[None, :]
    t0 = ids.shape[1]
    capacity = kv_capacity or min(cfg.max_position_embeddings, t0 + max_new_tokens)
    if cache_type == "rotating":
        from .models.llama import RotatingKVCache

        cache = RotatingKVCache.create(cfg, 1, dtype=compute_dtype)
    elif cache_type == "hybrid":
        from .models.llama import HybridKVCache

        cache = HybridKVCache.create(cfg, 1, capacity, dtype=compute_dtype)
    else:
        cache = KVCache.create(cfg, 1, capacity, dtype=compute_dtype)
    stops = stop_tokens if stop_tokens is not None else set(cfg.eos_token_ids)

    # hashability for jit static arg
    cfg_key = _freeze(cfg)
    logits, cache = _prefill_step(weights, cfg_key, jnp.asarray(ids), cache, backend, compute_dtype)

    key = jax.random.PRNGKey(seed)
    out: list[int] = []
    pos = jnp.asarray([t0], jnp.int32)
    for _ in range(max_new_tokens):
        if temperature > 0:
            key, sub = jax.random.split(key)
            tok = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        tok_i = int(tok[0])
        if tok_i in stops:
            break
        out.append(tok_i)
        logits, cache = _decode_step(
            weights, cfg_key, tok.astype(jnp.int32), pos, cache, backend, compute_dtype
        )
        pos = pos + 1
    return out


_FROZEN: dict = {}


def _freeze(cfg: ModelConfig) -> "FrozenConfig":
    key = repr(cfg)
    if key not in _FROZEN:
        _FROZEN[key] = FrozenConfig(cfg)
    return _FROZEN[key]


@dataclass(frozen=True, eq=False)
class FrozenConfig:
    """Hashable wrapper so ModelConfig can be a jit static argument."""

    cfg: ModelConfig

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "cfg"), name)

    def __hash__(self):
        return hash(repr(object.__getattribute__(self, "cfg")))

    def __eq__(self, other):
        return isinstance(other, FrozenConfig) and repr(self.cfg) == repr(other.cfg)
