"""GLM-4V / GLM-4.5V vision tower — the analog of the reference's
`mistralrs-core/src/vision_models/glm4v/`: conv3d-as-linear patch embed,
post-conv RMSNorm, BICUBIC grid-sampled learned position embeddings (torch
`F.grid_sample(mode="bicubic", align_corners=False, padding_mode="border")`
replicated with the Keys a=-0.75 kernel), 2D-rope RMSNorm blocks with
gated-silu MLPs, a merge-window conv downsample to the text width, and a
gated patch merger.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .qwen2vl import _merge_permuted_axis_ids, _rope_half


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


@dataclass(frozen=True)
class Glm4vVisionConfig:
    depth: int
    hidden_size: int
    intermediate_size: int  # (unused: vision MLP width = out_hidden_size)
    num_heads: int
    out_hidden_size: int
    image_size: int
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, d: Mapping) -> "Glm4vVisionConfig":
        return cls(
            depth=d["depth"], hidden_size=d["hidden_size"],
            intermediate_size=d.get("intermediate_size", 0),
            num_heads=d["num_heads"], out_hidden_size=d["out_hidden_size"],
            image_size=d.get("image_size", 336),
            in_channels=d.get("in_channels", 3),
            patch_size=d.get("patch_size", 14),
            temporal_patch_size=d.get("temporal_patch_size", 2),
            spatial_merge_size=d.get("spatial_merge_size", 2),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def glm4v_vision_params(
    sd: Mapping[str, np.ndarray], cfg: Glm4vVisionConfig, dtype=jnp.float32
) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(sd[name], np.float32), dtype)

    pw = np.asarray(sd["patch_embed.proj.weight"], np.float32)
    dw = np.asarray(sd["downsample.weight"], np.float32)  # [out, D, m, m]
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        blk = {
            "norm1": g(p + "norm1.weight"), "norm2": g(p + "norm2.weight"),
            "qkv": g(p + "attn.qkv.weight"),
            "proj": g(p + "attn.proj.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
        }
        # attention_bias=False by default; real GLM-4V ships bias-free attn
        blk["qkv_b"] = g(p + "attn.qkv.bias") if p + "attn.qkv.bias" in sd else None
        blk["proj_b"] = g(p + "attn.proj.bias") if p + "attn.proj.bias" in sd else None
        blocks.append(blk)
    return {
        "patch_embed": jnp.asarray(pw.reshape(cfg.hidden_size, -1).T, dtype),
        "patch_bias": g("patch_embed.proj.bias"),
        "post_conv_norm": g("post_conv_layernorm.weight"),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "post_norm": g("post_layernorm.weight"),
        # merge-window conv == linear over the flattened window (row-major)
        "downsample": jnp.asarray(
            dw.reshape(dw.shape[0], -1).T, dtype
        ),  # [D*m*m, out]
        "blocks": blocks,
        "merger_proj": g("merger.proj.weight"),
        "merger_ln": g("merger.post_projection_norm.weight"),
        "merger_ln_b": g("merger.post_projection_norm.bias"),
        "merger_gate": g("merger.gate_proj.weight"),
        "merger_up": g("merger.up_proj.weight"),
        "merger_down": g("merger.down_proj.weight"),
    }


def _bicubic_weights(frac: np.ndarray, a: float = -0.75) -> np.ndarray:
    """[N] fractional offsets → [N, 4] Keys cubic-convolution tap weights."""
    d = frac[:, None] + np.array([1.0, 0.0, -1.0, -2.0])[None, :]
    ad = np.abs(d)
    w_near = ((a + 2) * ad - (a + 3)) * ad * ad + 1
    w_far = ((a * ad - 5 * a) * ad + 8 * a) * ad - 4 * a
    return np.where(ad <= 1, w_near, np.where(ad < 2, w_far, 0.0))


def _sampled_pos_embed(
    pos: np.ndarray,  # [S², D] learned grid
    h_coords: np.ndarray,  # [N] per-token h within its image grid
    w_coords: np.ndarray,  # [N]
    target_h: int,
    target_w: int,
) -> np.ndarray:
    """torch grid_sample bicubic / align_corners=False / border padding."""
    side = int(round(pos.shape[0] ** 0.5))
    grid = pos.reshape(side, side, -1).astype(np.float32)

    def taps(coords, target):
        px = (coords + 0.5) / target * side - 0.5
        base = np.floor(px)
        w = _bicubic_weights(px - base)
        idx = np.clip(
            base[:, None].astype(np.int64) + np.array([-1, 0, 1, 2])[None],
            0, side - 1,
        )
        return idx, w

    hi, hw = taps(np.asarray(h_coords, np.float32), target_h)
    wi, ww = taps(np.asarray(w_coords, np.float32), target_w)
    # [N, 4, 4, D] gather then separable cubic mix
    patch = grid[hi[:, :, None], wi[:, None, :]]  # [N, 4, 4, D]
    return np.einsum("nijd,ni,nj->nd", patch, hw, ww, optimize=True)


def glm4v_vision_forward(
    params: dict,
    cfg: Glm4vVisionConfig,
    patches: jax.Array,  # [N, C*tps*p*p] pre-patchified (merge-block order)
    grid_thw: tuple[int, int, int],
) -> jax.Array:
    """→ merged image tokens [N/m², out_hidden_size]."""
    t, gh, gw = grid_thw
    m = cfg.spatial_merge_size
    eps = cfg.rms_norm_eps
    h = patches.astype(jnp.float32) @ params["patch_embed"] + params["patch_bias"]
    h = _rms(h, params["post_conv_norm"], eps)
    # position ids (merge-block order) feed both the bicubic-resampled
    # learned embedding and the 2D rope
    hpos = _merge_permuted_axis_ids(gh, gw, m, axis=0)
    wpos = _merge_permuted_axis_ids(gw, gh, m, axis=1)
    hpos_t = np.tile(hpos, t)
    wpos_t = np.tile(wpos, t)
    h = h + jnp.asarray(
        _sampled_pos_embed(
            np.asarray(params["pos_embed"], np.float32), hpos_t, wpos_t, gh, gw
        ),
        h.dtype,
    )
    dim = cfg.head_dim // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2) / dim))
    freqs = np.concatenate(
        [hpos_t[:, None] * inv[None], wpos_t[:, None] * inv[None]], axis=-1
    )
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5
    n = h.shape[0]
    for lw in params["blocks"]:
        x = _rms(h, lw["norm1"], eps)
        qkv = x @ lw["qkv"].T
        if lw["qkv_b"] is not None:
            qkv = qkv + lw["qkv_b"]
        qkv = qkv.reshape(n, 3, nh, hd)
        q = _rope_half(qkv[:, 0], cos, sin)
        k = _rope_half(qkv[:, 1], cos, sin)
        v = qkv[:, 2]
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, nh * hd)
        attn = attn @ lw["proj"].T
        if lw["proj_b"] is not None:
            attn = attn + lw["proj_b"]
        h = h + attn
        x = _rms(h, lw["norm2"], eps)
        h = h + (jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)) @ lw["down"].T

    h = _rms(h, params["post_norm"], eps)
    # downsample conv over each m×m merge window: tokens are already in
    # merge-block order, so the window is m² consecutive rows; the conv
    # kernel reads (channel, kh, kw) row-major → transpose window-first
    d = h.shape[-1]
    hwin = h.reshape(-1, m * m, d).transpose(0, 2, 1).reshape(-1, d * m * m)
    h = hwin @ params["downsample"]
    # gated merger
    h = h @ params["merger_proj"].T
    x32 = h.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)) * params["merger_ln"] + params[
        "merger_ln_b"
    ]
    h = jax.nn.gelu(h, approximate=False)
    return (
        jax.nn.silu(h @ params["merger_gate"].T) * (h @ params["merger_up"].T)
    ) @ params["merger_down"].T
