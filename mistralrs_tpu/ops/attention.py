"""Attention dispatch — the analog of `Sdpa::run_attention`
(`mistralrs-core/src/attention/mod.rs:254`): GQA group expansion, softcap,
sliding window, causal masking over a static-size KV buffer.

The XLA path below is the reference implementation (einsum + f32 softmax —
XLA fuses this well on the MXU for prefill). The paged/flash Pallas kernels
in `paged_attention.py` take over the serving hot paths; both must agree
numerically with this function.

Static-shape discipline: KV buffers are fixed-capacity; validity is carried
as integer lengths and enforced with masks, so every batch shape hits a
cached jit executable (the analog of the reference's CUDA-graph shape keys,
`mistralrs-core/src/pipeline/cuda_graph.rs:666`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sdpa(
    q: jax.Array,  # [B, T, n_q_heads, head_dim]
    k: jax.Array,  # [B, S, n_kv_heads, head_dim]
    v: jax.Array,  # [B, S, n_kv_heads, head_dim]
    *,
    q_positions: jax.Array,  # [B, T] absolute position of each query token
    kv_len: jax.Array,  # [B] number of valid KV entries (k[:, :kv_len] valid)
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int | jax.Array] = None,  # static or traced scalar;
    # <=0 or jnp.iinfo(int32).max → no window
    sinks: Optional[jax.Array] = None,  # [n_q_heads] attention-sink logits
    kv_positions: Optional[jax.Array] = None,  # [B, S]: absolute position of
    # each KV slot (ring/rotating caches); -1 → invalid slot. When given,
    # kv_len is ignored (validity comes from the positions).
) -> jax.Array:
    """Causal grouped-query attention over a (possibly over-allocated) KV buffer.

    KV position ``s`` is visible to query at absolute position ``p`` iff
    ``s <= p`` and ``s < kv_len`` and (sliding window) ``s > p - window``.
    Returns [B, T, n_q_heads, head_dim] in q.dtype.
    """
    b, t, n_q, hd = q.shape
    _, s, n_kv, _ = k.shape
    group = n_q // n_kv
    if scale is None:
        scale = 1.0 / math.sqrt(hd)

    qf = q.reshape(b, t, n_kv, group, hd).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    logits = jnp.einsum("btkgh,bskh->bkgts", qf, kf) * scale

    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    if kv_positions is not None:
        kv_pos = kv_positions  # [B, S] explicit (ring layout)
        valid = kv_pos >= 0
    else:
        kv_pos = jnp.arange(s)[None, :]  # [1, S]
        valid = jnp.broadcast_to(kv_pos < kv_len[:, None], (b, s))  # [B, S]
    causal = kv_pos[..., None, :] <= q_positions[:, :, None]  # [B, T, S]
    mask = valid[:, None, :] & causal
    if sliding_window is not None:
        # (q_pos - kv_pos) stays small → no int32 overflow with huge windows
        dist = q_positions[:, :, None] - kv_pos[..., None, :]
        window = jnp.asarray(sliding_window, jnp.int32)
        in_window = (dist < window) | (window <= 0)
        mask = mask & in_window
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)

    if sinks is not None:
        # gpt-oss style attention sinks: an extra per-head logit that absorbs
        # probability mass (reference: attention/backends/sinks.rs)
        sink = sinks.reshape(n_kv, group).astype(jnp.float32)
        sink = jnp.broadcast_to(sink[None, :, :, None, None], (b, n_kv, group, t, 1))
        logits = jnp.concatenate([logits, sink], axis=-1)
        probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(logits, axis=-1)

    out = jnp.einsum("bkgts,bskh->btkgh", probs, v.astype(jnp.float32))
    return out.reshape(b, t, n_q, hd).astype(q.dtype)
