"""Qwen3-VL vision tower — the analog of the reference's
`mistralrs-core/src/vision_models/qwen3vl/` encoder: linear (conv3d) patch
embedding, learned position grid bilinearly interpolated per image via the
4-corner gather (`fast_pos_embed_interpolate`), 2D rotary attention blocks,
and TWO merger kinds — the final pre-shuffle-normed patch merger plus
post-shuffle-normed DeepStack mergers tapped at intermediate block indexes
whose outputs feed the text decoder's first layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .qwen2vl import _ln, _merge_permuted_axis_ids, _rope_half


@dataclass(frozen=True)
class Qwen3VLVisionConfig:
    depth: int
    hidden_size: int
    intermediate_size: int
    num_heads: int
    out_hidden_size: int
    num_position_embeddings: int
    deepstack_visual_indexes: tuple[int, ...]
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_act: str = "gelu_pytorch_tanh"
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, d: Mapping) -> "Qwen3VLVisionConfig":
        return cls(
            depth=d["depth"], hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_heads=d["num_heads"], out_hidden_size=d["out_hidden_size"],
            num_position_embeddings=d["num_position_embeddings"],
            deepstack_visual_indexes=tuple(d["deepstack_visual_indexes"]),
            in_channels=d.get("in_channels", 3),
            patch_size=d.get("patch_size", 16),
            temporal_patch_size=d.get("temporal_patch_size", 2),
            spatial_merge_size=d.get("spatial_merge_size", 2),
            hidden_act=d.get("hidden_act", "gelu_pytorch_tanh"),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def qwen3vl_vision_params(
    sd: Mapping[str, np.ndarray], cfg: Qwen3VLVisionConfig, dtype=jnp.float32
) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(sd[name], np.float32), dtype)

    def merger(prefix):
        return {
            "norm_w": g(prefix + "norm.weight"),
            "norm_b": g(prefix + "norm.bias"),
            "fc1": g(prefix + "linear_fc1.weight"),
            "fc1_b": g(prefix + "linear_fc1.bias"),
            "fc2": g(prefix + "linear_fc2.weight"),
            "fc2_b": g(prefix + "linear_fc2.bias"),
        }

    pw = np.asarray(sd["patch_embed.proj.weight"], np.float32)
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        blocks.append({
            "norm1_w": g(p + "norm1.weight"), "norm1_b": g(p + "norm1.bias"),
            "norm2_w": g(p + "norm2.weight"), "norm2_b": g(p + "norm2.bias"),
            "qkv": g(p + "attn.qkv.weight"), "qkv_b": g(p + "attn.qkv.bias"),
            "proj": g(p + "attn.proj.weight"), "proj_b": g(p + "attn.proj.bias"),
            "fc1": g(p + "mlp.linear_fc1.weight"), "fc1_b": g(p + "mlp.linear_fc1.bias"),
            "fc2": g(p + "mlp.linear_fc2.weight"), "fc2_b": g(p + "mlp.linear_fc2.bias"),
        })
    return {
        "patch_embed": jnp.asarray(pw.reshape(cfg.hidden_size, -1).T, dtype),
        "patch_bias": g("patch_embed.proj.bias"),
        "pos_embed": g("pos_embed.weight"),
        "blocks": blocks,
        "merger": merger("merger."),
        "ds_mergers": [
            merger(f"deepstack_merger_list.{j}.")
            for j in range(len(cfg.deepstack_visual_indexes))
        ],
    }


def _interpolated_pos_embed(
    pos: np.ndarray, side: int, t: int, h: int, w: int, m: int
) -> np.ndarray:
    """HF `fast_pos_embed_interpolate`: per-axis linspace onto the learned
    side×side grid, 4-corner bilinear mix, then permuted into the
    merge-block token order and tiled over t frames."""
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf_, wf_ = h_idx.astype(np.int32), w_idx.astype(np.int32)
    hc = np.clip(hf_ + 1, None, side - 1)
    wc = np.clip(wf_ + 1, None, side - 1)
    dh = (h_idx - hf_)[:, None]
    dw = (w_idx - wf_)[None, :]
    grid = pos.reshape(side, side, -1)
    out = (
        grid[hf_][:, wf_] * ((1 - dh) * (1 - dw))[..., None]
        + grid[hf_][:, wc] * ((1 - dh) * dw)[..., None]
        + grid[hc][:, wf_] * (dh * (1 - dw))[..., None]
        + grid[hc][:, wc] * (dh * dw)[..., None]
    ).reshape(h * w, -1)
    perm = (
        np.arange(h * w)
        .reshape(h // m, m, w // m, m)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    return np.tile(out[perm], (t, 1))


def qwen3vl_vision_forward(
    params: dict,
    cfg: Qwen3VLVisionConfig,
    patches: jax.Array,  # [N, C*tps*p*p] pre-patchified (merge-block order)
    grid_thw: tuple[int, int, int],
) -> tuple[jax.Array, jax.Array]:
    """→ (merged tokens [N/m², out], deepstack features [k, N/m², out])."""
    t, gh, gw = grid_thw
    m = cfg.spatial_merge_size
    side = int(round(cfg.num_position_embeddings ** 0.5))
    h = patches.astype(jnp.float32) @ params["patch_embed"] + params["patch_bias"]
    h = h + jnp.asarray(
        _interpolated_pos_embed(
            np.asarray(params["pos_embed"], np.float32), side, t, gh, gw, m
        ),
        h.dtype,
    )
    # 2D rope in merge-block order (same scheme as qwen2-vl)
    hpos = _merge_permuted_axis_ids(gh, gw, m, axis=0)
    wpos = _merge_permuted_axis_ids(gw, gh, m, axis=1)
    dim = cfg.head_dim // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2) / dim))
    freqs = np.concatenate(
        [hpos[:, None] * inv[None], wpos[:, None] * inv[None]], axis=-1
    )
    freqs = np.tile(freqs, (t, 1))
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    def merge(x, mg, postshuffle):
        if postshuffle:
            x = x.reshape(-1, cfg.hidden_size * m * m)
            x = _ln(x, mg["norm_w"], mg["norm_b"])
        else:
            x = _ln(x, mg["norm_w"], mg["norm_b"]).reshape(
                -1, cfg.hidden_size * m * m
            )
        x = x @ mg["fc1"].T + mg["fc1_b"]
        x = jax.nn.gelu(x, approximate=False)  # nn.GELU() exact form
        return x @ mg["fc2"].T + mg["fc2_b"]

    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5
    n = h.shape[0]
    tanh_gelu = cfg.hidden_act in ("gelu_pytorch_tanh", "gelu_new")
    deepstack = []
    for i, lw in enumerate(params["blocks"]):
        x = _ln(h, lw["norm1_w"], lw["norm1_b"])
        qkv = (x @ lw["qkv"].T + lw["qkv_b"]).reshape(n, 3, nh, hd)
        q = _rope_half(qkv[:, 0], cos, sin)
        k = _rope_half(qkv[:, 1], cos, sin)
        v = qkv[:, 2]
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, nh * hd)
        h = h + attn @ lw["proj"].T + lw["proj_b"]
        x = _ln(h, lw["norm2_w"], lw["norm2_b"])
        ff = x @ lw["fc1"].T + lw["fc1_b"]
        ff = jax.nn.gelu(ff, approximate=tanh_gelu)
        h = h + ff @ lw["fc2"].T + lw["fc2_b"]
        if i in cfg.deepstack_visual_indexes:
            j = cfg.deepstack_visual_indexes.index(i)
            deepstack.append(merge(h, params["ds_mergers"][j], True))
    tokens = merge(h, params["merger"], False)
    return tokens, jnp.stack(deepstack)
