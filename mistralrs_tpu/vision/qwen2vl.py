"""Qwen2-VL vision transformer — the analog of the reference's
`vision_models/qwen2vl/` tower: 3D patch embedding (temporal×patch×patch),
2-axis rotary positions in spatial-merge-permuted order, full attention,
quick-gelu MLP, and the spatial-merge PatchMerger into the text hidden
size. Verified against HF `Qwen2VisionTransformerPretrainedModel`."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int
    embed_dim: int
    num_heads: int
    hidden_size: int  # output (text) hidden size
    mlp_ratio: int = 4
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, d: Mapping) -> "Qwen2VLVisionConfig":
        return cls(
            depth=d["depth"], embed_dim=d["embed_dim"],
            num_heads=d["num_heads"], hidden_size=d["hidden_size"],
            mlp_ratio=d.get("mlp_ratio", 4),
            in_channels=d.get("in_channels", 3),
            patch_size=d.get("patch_size", 14),
            temporal_patch_size=d.get("temporal_patch_size", 2),
            spatial_merge_size=d.get("spatial_merge_size", 2),
        )

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def _merge_permuted_axis_ids(n: int, other: int, merge: int, axis: int) -> np.ndarray:
    """h/w position ids in the spatial-merge-block traversal order."""
    if axis == 0:
        ids = np.broadcast_to(np.arange(n)[:, None], (n, other))
        h, w = n, other
    else:
        ids = np.broadcast_to(np.arange(n)[None, :], (other, n))
        h, w = other, n
    ids = ids.reshape(h // merge, merge, w // merge, merge)
    return ids.transpose(0, 2, 1, 3).reshape(-1)


def vision_rope(cfg: Qwen2VLVisionConfig, grid_thw: tuple[int, int, int]):
    """(cos, sin) [N, head_dim//2] for one image grid (t, h, w)."""
    t, h, w = grid_thw
    m = cfg.spatial_merge_size
    hpos = _merge_permuted_axis_ids(h, w, m, axis=0)
    wpos = _merge_permuted_axis_ids(w, h, m, axis=1)
    dim = cfg.head_dim // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2) / dim))
    freqs_h = hpos[:, None] * inv[None]
    freqs_w = wpos[:, None] * inv[None]
    freqs = np.concatenate([freqs_h, freqs_w], axis=-1)  # [h*w, head_dim//2]
    freqs = np.tile(freqs, (t, 1))
    return jnp.asarray(np.cos(freqs), jnp.float32), jnp.asarray(
        np.sin(freqs), jnp.float32
    )


def _rope_half(x, cos, sin):
    """rotate-half over the whole head dim; cos/sin [N, hd//2]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, None]
    s = sin[:, None]
    out1 = x1 * c - x2 * s
    out2 = x2 * c + x1 * s
    return jnp.concatenate([out1, out2], axis=-1)


def _ln(x, w, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b


def qwen2vl_vision_forward(
    params: dict,
    cfg: Qwen2VLVisionConfig,
    patches: jax.Array,  # [N, C * tps * p * p] pre-patchified pixels
    grid_thw: tuple[int, int, int],
) -> jax.Array:
    """→ merged image tokens [N / merge², hidden_size]."""
    h = patches.astype(jnp.float32) @ params["patch_embed"]
    cos, sin = vision_rope(cfg, grid_thw)
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5
    n = h.shape[0]
    for lw in params["blocks"]:
        x = _ln(h, lw["norm1_w"], lw["norm1_b"])
        qkv = x @ lw["qkv"].T + lw["qkv_b"]
        qkv = qkv.reshape(n, 3, nh, hd)
        q = _rope_half(qkv[:, 0], cos, sin)
        k = _rope_half(qkv[:, 1], cos, sin)
        v = qkv[:, 2]
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, nh * hd)
        h = h + attn @ lw["proj"].T + lw["proj_b"]
        x = _ln(h, lw["norm2_w"], lw["norm2_b"])
        ff = x @ lw["fc1"].T + lw["fc1_b"]
        ff = ff * jax.nn.sigmoid(1.702 * ff)  # quick_gelu
        h = h + ff @ lw["fc2"].T + lw["fc2_b"]

    mg = params["merger"]
    x = _ln(h, mg["ln_q_w"], mg["ln_q_b"])
    m2 = cfg.spatial_merge_size ** 2
    x = x.reshape(-1, cfg.embed_dim * m2)
    x = x @ mg["mlp0"].T + mg["mlp0_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ mg["mlp2"].T + mg["mlp2_b"]


# --------------------------------------------------------------------------
# Qwen2.5-VL variant: RMSNorm blocks, silu-gated MLP, windowed attention
# with token reordering (full attention only on `fullatt_block_indexes`)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Qwen25VLVisionConfig:
    depth: int
    hidden_size: int  # block width
    intermediate_size: int
    num_heads: int
    out_hidden_size: int
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, d: Mapping) -> "Qwen25VLVisionConfig":
        return cls(
            depth=d["depth"], hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_heads=d["num_heads"], out_hidden_size=d["out_hidden_size"],
            window_size=d.get("window_size", 112),
            fullatt_block_indexes=tuple(d.get("fullatt_block_indexes", ())),
            in_channels=d.get("in_channels", 3),
            patch_size=d.get("patch_size", 14),
            temporal_patch_size=d.get("temporal_patch_size", 2),
            spatial_merge_size=d.get("spatial_merge_size", 2),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _window_index(cfg: Qwen25VLVisionConfig, grid_thw):
    """(window_index [n_merged], token window ids [N]) — HF
    `get_window_index`: merged tokens regrouped into
    window_size/patch/merge-sized spatial windows with padding dropped."""
    t, h, w = grid_thw
    m = cfg.spatial_merge_size
    lh, lw = h // m, w // m
    vw = cfg.window_size // m // cfg.patch_size
    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    pad_h = (-lh) % vw
    pad_w = (-lw) % vw
    padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
    padded[:, :lh, :lw] = idx
    nh, nw = (lh + pad_h) // vw, (lw + pad_w) // vw
    padded = padded.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
    padded = padded.reshape(t, nh * nw, vw, vw)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]
    unit = m * m
    cu = np.concatenate([[0], np.cumsum(seqlens) * unit])
    token_win = np.searchsorted(cu, np.arange(len(window_index) * unit),
                                side="right") - 1
    return window_index, token_win


def qwen25vl_vision_forward(
    params: dict,
    cfg: Qwen25VLVisionConfig,
    patches: jax.Array,  # [N, C * tps * p * p]
    grid_thw: tuple[int, int, int],
) -> jax.Array:
    """→ merged image tokens [N / merge², out_hidden_size] (original order)."""
    h = patches.astype(jnp.float32) @ params["patch_embed"]
    cos, sin = vision_rope(
        Qwen2VLVisionConfig(
            depth=cfg.depth, embed_dim=cfg.hidden_size,
            num_heads=cfg.num_heads, hidden_size=cfg.out_hidden_size,
            patch_size=cfg.patch_size,
            temporal_patch_size=cfg.temporal_patch_size,
            spatial_merge_size=cfg.spatial_merge_size,
        ),
        grid_thw,
    )
    n = h.shape[0]
    unit = cfg.spatial_merge_size ** 2
    window_index, token_win = _window_index(cfg, grid_thw)
    perm = (window_index[:, None] * unit + np.arange(unit)[None]).reshape(-1)
    h = h[perm]
    cos = cos[perm]
    sin = sin[perm]
    same_win = jnp.asarray(token_win[:, None] == token_win[None, :])
    # "full" attention is still per-frame (HF cu_seqlens split grid t-wise)
    t_, gh, gw = grid_thw
    m_ = cfg.spatial_merge_size
    frame = np.repeat(window_index // ((gh // m_) * (gw // m_)), unit)
    same_frame = jnp.asarray(frame[:, None] == frame[None, :])
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5

    def rms(x, wt, eps=1e-6):
        x32 = x.astype(jnp.float32)
        return x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, -1, keepdims=True) + eps
        ) * wt

    for li, lw_ in enumerate(params["blocks"]):
        x = rms(h, lw_["norm1_w"])
        qkv = (x @ lw_["qkv"].T + lw_["qkv_b"]).reshape(n, 3, nh, hd)
        q = _rope_half(qkv[:, 0], cos, sin)
        k = _rope_half(qkv[:, 1], cos, sin)
        v = qkv[:, 2]
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        allowed = (
            same_frame if li in cfg.fullatt_block_indexes else same_win
        )
        logits = jnp.where(allowed[None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, nh * hd)
        h = h + attn @ lw_["proj"].T + lw_["proj_b"]
        x = rms(h, lw_["norm2_w"])
        ff = (jax.nn.silu(x @ lw_["gate"].T + lw_["gate_b"])
              * (x @ lw_["up"].T + lw_["up_b"]))
        h = h + ff @ lw_["down"].T + lw_["down_b"]

    mg = params["merger"]
    x = rms(h, mg["ln_q_w"])
    x = x.reshape(-1, cfg.hidden_size * unit)
    x = x @ mg["mlp0"].T + mg["mlp0_b"]
    x = jax.nn.gelu(x, approximate=False)
    out = x @ mg["mlp2"].T + mg["mlp2_b"]
    return out[np.argsort(window_index)]


def qwen25vl_vision_params(
    sd: Mapping[str, np.ndarray], cfg: Qwen25VLVisionConfig,
    prefix: str = "", dtype=jnp.float32,
) -> dict:
    def g(nm):
        return jnp.asarray(np.asarray(sd[prefix + nm], np.float32), dtype)

    pw = np.asarray(sd[prefix + "patch_embed.proj.weight"], np.float32)
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        if prefix + p + "attn.qkv.weight" in sd:
            qkv, qkv_b = g(p + "attn.qkv.weight"), g(p + "attn.qkv.bias")
        else:
            # qwen2.5-omni's vision attention splits q/k/v — fuse to the
            # [q; k; v] layout the forward's (n, 3, nh, hd) reshape expects
            qkv = jnp.concatenate(
                [g(p + f"attn.{n}.weight") for n in ("q", "k", "v")], axis=0
            )
            qkv_b = jnp.concatenate(
                [g(p + f"attn.{n}.bias") for n in ("q", "k", "v")], axis=0
            )
        blocks.append({
            "norm1_w": g(p + "norm1.weight"), "norm2_w": g(p + "norm2.weight"),
            "qkv": qkv, "qkv_b": qkv_b,
            "proj": g(p + "attn.proj.weight"), "proj_b": g(p + "attn.proj.bias"),
            "gate": g(p + "mlp.gate_proj.weight"), "gate_b": g(p + "mlp.gate_proj.bias"),
            "up": g(p + "mlp.up_proj.weight"), "up_b": g(p + "mlp.up_proj.bias"),
            "down": g(p + "mlp.down_proj.weight"), "down_b": g(p + "mlp.down_proj.bias"),
        })
    return {
        "patch_embed": jnp.asarray(pw.reshape(cfg.hidden_size, -1).T, dtype),
        "blocks": blocks,
        "merger": {
            "ln_q_w": g("merger.ln_q.weight"),
            "mlp0": g("merger.mlp.0.weight"), "mlp0_b": g("merger.mlp.0.bias"),
            "mlp2": g("merger.mlp.2.weight"), "mlp2_b": g("merger.mlp.2.bias"),
        },
    }


def qwen2vl_vision_params(
    sd: Mapping[str, np.ndarray], cfg: Qwen2VLVisionConfig,
    prefix: str = "", dtype=jnp.float32,
) -> dict:
    def g(n):
        return jnp.asarray(np.asarray(sd[prefix + n], np.float32), dtype)

    pw = np.asarray(sd[prefix + "patch_embed.proj.weight"], np.float32)
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        blocks.append({
            "norm1_w": g(p + "norm1.weight"), "norm1_b": g(p + "norm1.bias"),
            "norm2_w": g(p + "norm2.weight"), "norm2_b": g(p + "norm2.bias"),
            "qkv": g(p + "attn.qkv.weight"), "qkv_b": g(p + "attn.qkv.bias"),
            "proj": g(p + "attn.proj.weight"), "proj_b": g(p + "attn.proj.bias"),
            "fc1": g(p + "mlp.fc1.weight"), "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2": g(p + "mlp.fc2.weight"), "fc2_b": g(p + "mlp.fc2.bias"),
        })
    return {
        "patch_embed": jnp.asarray(pw.reshape(cfg.embed_dim, -1).T, dtype),
        "blocks": blocks,
        "merger": {
            "ln_q_w": g("merger.ln_q.weight"), "ln_q_b": g("merger.ln_q.bias"),
            "mlp0": g("merger.mlp.0.weight"), "mlp0_b": g("merger.mlp.0.bias"),
            "mlp2": g("merger.mlp.2.weight"), "mlp2_b": g("merger.mlp.2.bias"),
        },
    }
