"""Normalization ops (analog of the reference's `RmsNorm`/`LayerNorm` in
`mistralrs-core/src/layers.rs` and the fused rms_norm+residual CUDA kernel
`mistralrs-core/src/ops.rs:2142`).

On TPU these are VPU-bound elementwise chains that XLA fuses into the
surrounding matmuls, so the idiomatic implementation is plain jnp — a Pallas
kernel would only re-derive what the fusion pass already does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in f32 accumulation (matches HF Llama semantics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def rms_norm_gemma(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma-style RMSNorm: weight is stored as (w - 1), applied as (1 + w)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array | None = None, eps: float = 1e-5
) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
