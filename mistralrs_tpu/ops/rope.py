"""Rotary position embeddings — the RoPE family of the reference
(`mistralrs-core/src/layers.rs:628-657`: standard, Llama3, YaRN/LongRope).

Convention: HF ``rotate_half`` (first half / second half pairing). GGUF
checkpoints converted from HF are un-permuted back to this convention at load
(see `models/gguf_loader.py`), so a single RoPE implementation serves both
weight sources.

Frequencies are computed in f32 once per (pos, head_dim) and applied as a
fused elementwise op; XLA folds this into the attention chain.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp


def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[dict[str, Any]] = None,
) -> jax.Array:
    """Per-pair inverse frequencies [head_dim // 2], with optional scaling.

    ``scaling`` follows the HF ``rope_scaling`` config dict:
      - {"rope_type"/"type": "linear", "factor": f}
      - {"rope_type": "llama3", "factor", "low_freq_factor", "high_freq_factor",
         "original_max_position_embeddings"}
      - {"rope_type": "yarn", "factor", "original_max_position_embeddings",
         ["beta_fast"], ["beta_slow"]}
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if not scaling:
        return inv_freq
    kind = scaling.get("rope_type") or scaling.get("type") or "default"
    if kind in ("default", "none"):
        return inv_freq
    if kind == "linear":
        return inv_freq / float(scaling["factor"])
    if kind == "llama3":
        factor = float(scaling["factor"])
        low = float(scaling.get("low_freq_factor", 1.0))
        high = float(scaling.get("high_freq_factor", 4.0))
        orig = float(scaling.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * math.pi / inv_freq
        low_wl = orig / low
        high_wl = orig / high
        smooth = (orig / wavelen - low) / (high - low)
        scaled = jnp.where(
            wavelen > low_wl,
            inv_freq / factor,
            jnp.where(
                wavelen < high_wl,
                inv_freq,
                (1 - smooth) * inv_freq / factor + smooth * inv_freq,
            ),
        )
        return scaled
    if kind == "yarn":
        factor = float(scaling["factor"])
        orig = float(scaling.get("original_max_position_embeddings", 4096))
        beta_fast = float(scaling.get("beta_fast", 32.0))
        beta_slow = float(scaling.get("beta_slow", 1.0))

        def correction_dim(num_rot: float) -> float:
            return (head_dim * math.log(orig / (num_rot * 2 * math.pi))) / (
                2 * math.log(theta)
            )

        low = correction_dim(beta_fast)
        high = correction_dim(beta_slow)
        if scaling.get("truncate", True):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, head_dim - 1)
        dims = jnp.arange(head_dim // 2, dtype=jnp.float32)
        # ramp 0 → high-frequency dim (extrapolate, unscaled);
        # ramp 1 → low-frequency dim (interpolate, /factor)
        ramp = jnp.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
        return inv_freq / factor * ramp + inv_freq * (1.0 - ramp)
    raise NotImplementedError(f"rope scaling type {kind!r}")


def yarn_attention_factor(scaling: Optional[dict[str, Any]]) -> float:
    """YaRN mscale applied to attention logits (1.0 when not using YaRN)."""
    if not scaling:
        return 1.0
    kind = scaling.get("rope_type") or scaling.get("type")
    if kind != "yarn":
        return 1.0
    factor = float(scaling["factor"])
    if factor <= 1.0:
        return 1.0
    return 0.1 * math.log(factor) + 1.0


def rope_cos_sin(
    positions: jax.Array, inv_freq: jax.Array, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """positions [...,] int32 -> (cos, sin) each [..., head_dim//2]."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, *, interleaved: bool = False
) -> jax.Array:
    """Apply RoPE over the leading ``2 * cos.shape[-1]`` dims of the head.

    x: [..., n_heads, head_dim]; cos/sin: broadcastable to [..., 1, rot//2]
    (i.e. computed from positions of shape x.shape[:-2]).

    ``interleaved`` selects the GLM/GPT-J pairing — pair j is dims
    ``(2j, 2j+1)`` — instead of the default HF rotate-half pairing
    ``(j, j + rot/2)``. Trailing dims past the rotary width pass through
    (partial rotary: phi2/GLM ``partial_rotary_factor``).
    """
    rot = cos.shape[-1] * 2
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    dtype = x.dtype
    if interleaved:
        x1 = x_rot[..., 0::2].astype(jnp.float32)
        x2 = x_rot[..., 1::2].astype(jnp.float32)
        out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        out = out.reshape(x_rot.shape).astype(dtype)
    else:
        half = rot // 2
        x1 = x_rot[..., :half].astype(jnp.float32)
        x2 = x_rot[..., half:].astype(jnp.float32)
        out = jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(dtype)
    if x_pass.shape[-1] == 0:
        return out
    return jnp.concatenate([out, x_pass], axis=-1)


def mrope_cos_sin(
    positions3,  # [3, B, T] (temporal, height, width) int positions
    inv_freq,  # [head_dim // 2] inverse frequencies
    sections,  # per-section channel widths summing to head_dim // 2
):
    """Section-combined (cos, sin) [B, T, head_dim // 2] for M-RoPE
    (qwen2-vl family): channel section ``i`` reads position stream
    ``i % 3``. Output feeds the standard rotate-half ``apply_rope``."""
    ang = positions3.astype(jnp.float32)[..., None] * inv_freq
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    parts_c, parts_s = [], []
    off = 0
    for i, sec in enumerate(sections):
        parts_c.append(cos[i % 3, ..., off : off + sec])
        parts_s.append(sin[i % 3, ..., off : off + sec])
        off += sec
    return jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1)


def mrope_cos_sin_interleaved(
    positions3,  # [3, B, T] (temporal, height, width) int positions
    inv_freq,  # [head_dim // 2] inverse frequencies
    sections,  # (t, h, w) channel counts summing to head_dim // 2
):
    """Qwen3-VL interleaved M-RoPE: channel j reads stream T by default,
    H when j % 3 == 1 and j < 3·sections[1], W when j % 3 == 2 and
    j < 3·sections[2] — the [THWTHW...TT] layout that keeps frequency
    continuity per stream (`Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope`)."""
    n = inv_freq.shape[0]
    j = jnp.arange(n)
    stream = jnp.where(
        (j % 3 == 1) & (j < 3 * sections[1]), 1,
        jnp.where((j % 3 == 2) & (j < 3 * sections[2]), 2, 0),
    )
    ang = positions3.astype(jnp.float32)[..., None] * inv_freq  # [3, B, T, n]
    sel = jnp.take_along_axis(ang, stream[None, None, None, :], axis=0)[0]
    return jnp.cos(sel), jnp.sin(sel)
