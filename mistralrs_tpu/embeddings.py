"""Embedding-model path (the analog of `mistralrs-core/src/embedding_models/`
— pooling + inputs; covers llama-family encoders like qwen3-embedding and
gemma-embedding served through the same decoder stack).

Pooling modes per the reference: "last" (causal LM convention), "mean"
(masked average), "cls" (first token)."""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .generate import _freeze
from .models.config import ModelConfig
from .models.llama import KVCache, forward


@functools.partial(jax.jit, static_argnames=("cfg", "pooling", "normalize", "backend"))
def _embed_batch(weights, cfg, ids, lengths, pooling, normalize, backend):
    b, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    cache = KVCache.create(cfg, b, t, dtype=jnp.bfloat16)
    hidden, _ = forward(
        weights, cfg, ids, positions, cache, jnp.zeros((b,), jnp.int32),
        backend=backend, return_hidden=True,
    )  # [B, T, H] f32
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
    if pooling == "mean":
        pooled = jnp.sum(hidden * mask[..., None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1.0
        )
    elif pooling == "cls":
        pooled = hidden[:, 0]
    else:  # "last": final valid token
        idx = jnp.maximum(lengths - 1, 0)
        pooled = hidden[jnp.arange(b), idx]
    if normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return pooled


def embed(
    weights: dict,
    cfg: ModelConfig,
    token_batches: Sequence[Sequence[int]],
    *,
    pooling: str = "last",
    normalize: bool = True,
    backend: Optional[str] = None,
    max_len: Optional[int] = None,
) -> np.ndarray:
    """Embed a batch of token sequences → [B, H] float32."""
    if not token_batches:
        return np.zeros((0, cfg.hidden_size), np.float32)
    lengths = np.asarray([len(x) for x in token_batches], np.int32)
    t = int(max_len or max(1, lengths.max()))
    ids = np.zeros((len(token_batches), t), np.int32)
    for i, toks in enumerate(token_batches):
        ids[i, : len(toks)] = toks[:t]
    out = _embed_batch(
        weights, _freeze(cfg), jnp.asarray(ids), jnp.asarray(lengths),
        pooling, normalize, backend,
    )
    return np.asarray(out)
