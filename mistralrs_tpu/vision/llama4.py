"""Llama 4 vision tower — the analog of the reference's
`mistralrs-core/src/vision_models/llama4/vision.rs`: unfold-linear patch
embedding, class token appended LAST, learned position embeddings, 2-D
rotary attention over patches, pixel-shuffle + 2-layer gelu adapter into
`projector_output_dim`, then the text-side linear projector.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rope import apply_rope


@dataclass(frozen=True)
class Llama4VisionConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    projector_input_dim: int
    projector_output_dim: int
    pixel_shuffle_ratio: float
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Llama4VisionConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            image_size=d["image_size"],
            patch_size=d["patch_size"],
            projector_input_dim=d["projector_input_dim"],
            projector_output_dim=d["projector_output_dim"],
            pixel_shuffle_ratio=d["pixel_shuffle_ratio"],
            norm_eps=d.get("norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10000.0),
        )


def llama4_vision_params(
    sd: Mapping[str, np.ndarray], cfg: Llama4VisionConfig, dtype=jnp.float32
) -> dict:
    g = lambda k: jnp.asarray(sd[k], dtype)  # noqa: E731
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "wq": g(p + "self_attn.q_proj.weight"),
            "wq_b": g(p + "self_attn.q_proj.bias"),
            "wk": g(p + "self_attn.k_proj.weight"),
            "wk_b": g(p + "self_attn.k_proj.bias"),
            "wv": g(p + "self_attn.v_proj.weight"),
            "wv_b": g(p + "self_attn.v_proj.bias"),
            "wo": g(p + "self_attn.o_proj.weight"),
            "wo_b": g(p + "self_attn.o_proj.bias"),
            "fc1": g(p + "mlp.fc1.weight"),
            "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2": g(p + "mlp.fc2.weight"),
            "fc2_b": g(p + "mlp.fc2.bias"),
            "ln1": g(p + "input_layernorm.weight"),
            "ln1_b": g(p + "input_layernorm.bias"),
            "ln2": g(p + "post_attention_layernorm.weight"),
            "ln2_b": g(p + "post_attention_layernorm.bias"),
        })
    return {
        "class_embedding": g("class_embedding"),
        "patch_embedding": g("patch_embedding.linear.weight"),
        "pos_embed": g("positional_embedding_vlm"),
        "ln_pre": g("layernorm_pre.weight"),
        "ln_pre_b": g("layernorm_pre.bias"),
        "ln_post": g("layernorm_post.weight"),
        "ln_post_b": g("layernorm_post.bias"),
        "adapter_fc1": g("vision_adapter.mlp.fc1.weight"),
        "adapter_fc2": g("vision_adapter.mlp.fc2.weight"),
        "layers": layers,
    }


def _vision_rope(cfg: Llama4VisionConfig):
    """(cos, sin) [num_patches+1, head_dim//2]: 2-D patch coordinates, CLS
    token (appended last) gets zero frequencies (identity rotation)."""
    idx = cfg.image_size // cfg.patch_size
    coords = np.arange(idx * idx)
    fx = np.concatenate([coords % idx, [0]]).astype(np.float32)
    fy = np.concatenate([coords // idx, [0]]).astype(np.float32)
    hd = cfg.hidden_size // cfg.num_heads
    fd = hd // 2
    rope_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, fd, 2)[: fd // 2].astype(np.float32) / fd)
    )
    freqs = np.concatenate(
        [(fx + 1)[:, None] * rope_freq[None], (fy + 1)[:, None] * rope_freq[None]],
        axis=-1,
    )  # [S, hd/2]
    freqs[-1] = 0.0  # CLS
    return jnp.asarray(np.cos(freqs)), jnp.asarray(np.sin(freqs))


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def pixel_shuffle(x: jax.Array, ratio: float) -> jax.Array:
    b, n, c = x.shape
    ps = int(np.sqrt(n))
    x = x.reshape(b, ps, ps, -1)
    x = x.reshape(b, ps, int(ps * ratio), int(c / ratio)).transpose(0, 2, 1, 3)
    x = x.reshape(
        b, int(ps * ratio), int(ps * ratio), int(c / ratio**2)
    ).transpose(0, 2, 1, 3)
    return x.reshape(b, -1, x.shape[-1])


def llama4_vision_forward(
    params: dict,
    cfg: Llama4VisionConfig,
    pixel_values: jax.Array,  # [N_tiles, 3, H, W]
) -> jax.Array:
    """→ adapted image features [N_tiles, out_patches, projector_output_dim]."""
    n, c, hh, ww = pixel_values.shape
    p = cfg.patch_size
    d = cfg.hidden_size
    nh, nw = hh // p, ww // p
    # unfold + linear patch embedding: HF's Unfold yields [C*p*p] per patch
    # in (c, ph, pw) channel-major order
    px = pixel_values.reshape(n, c, nh, p, nw, p).transpose(0, 2, 4, 1, 3, 5)
    patches = px.reshape(n, nh * nw, c * p * p)
    h = patches @ params["patch_embedding"].T
    cls = jnp.broadcast_to(params["class_embedding"], (n, 1, d))
    h = jnp.concatenate([h, cls], axis=1)  # CLS appended LAST
    h = h + params["pos_embed"]
    h = _ln(h, params["ln_pre"], params["ln_pre_b"], cfg.norm_eps)

    cos, sin = _vision_rope(cfg)
    cos = cos[None]
    sin = sin[None]
    heads = cfg.num_heads
    hd = d // heads
    for lw in params["layers"]:
        x = _ln(h, lw["ln1"], lw["ln1_b"], cfg.norm_eps)
        t = x.shape[1]
        q = (x @ lw["wq"].T + lw["wq_b"]).reshape(n, t, heads, hd)
        k = (x @ lw["wk"].T + lw["wk_b"]).reshape(n, t, heads, hd)
        v = (x @ lw["wv"].T + lw["wv_b"]).reshape(n, t, heads, hd)
        q = apply_rope(q, cos, sin, interleaved=True)
        k = apply_rope(k, cos, sin, interleaved=True)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(h.dtype)
        pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(n, t, d)
        h = h + (attn @ lw["wo"].T + lw["wo_b"])
        x = _ln(h, lw["ln2"], lw["ln2_b"], cfg.norm_eps)
        x = jax.nn.gelu(x @ lw["fc1"].T + lw["fc1_b"], approximate=False)
        h = h + (x @ lw["fc2"].T + lw["fc2_b"])

    h = _ln(h, params["ln_post"], params["ln_post_b"], cfg.norm_eps)
    h = h[:, :-1]  # drop CLS
    h = pixel_shuffle(h, cfg.pixel_shuffle_ratio)
    h = jax.nn.gelu(h @ params["adapter_fc1"].T, approximate=False)
    return jax.nn.gelu(h @ params["adapter_fc2"].T, approximate=False)
