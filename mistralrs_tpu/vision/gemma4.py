"""Gemma 4 vision — tower, unified embedder, multimodal projection.

TPU-native implementation of the reference's Gemma 4 vision surface
(`mistralrs-core/src/vision_models/gemma4/vision.rs:1-947` and
`multimodal_embedding.rs:1-65`), reference-spec protocol (no public HF
class exists for this family — semantics follow the reference code):

* **VisionTower** (`vision.rs:659`): linear patch embedder over raw
  ``patch_size²·3`` pixel patches scaled to [−1, 1] with a 2-axis learned
  position table (`PatchEmbedder`, vision.rs:209), 2-D rotary attention
  (`VisionRotaryEmbedding`, vision.rs:138 — head_dim split per spatial
  axis, GPT-NeoX rotate-half within each axis slice), GQA encoder layers
  with q/k RMSNorm + WEIGHTLESS v-norm and softmax scale **1.0**
  (vision.rs:309-353), gemma-style sandwich norms (vision.rs:483), and a
  position-binned average pooler (`VisionPooler`, vision.rs:566) scaled by
  √hidden, with optional ``std_bias/std_scale`` standardization.
* **UnifiedVisionEmbedder** (`vision.rs:669`): the lightweight path some
  checkpoints ship — LayerNorm(patch) → dense → LayerNorm → 2-axis pos
  table → LayerNorm → multimodal embedder, valid-position selection.
* **Gemma4MultimodalEmbedder** (`multimodal_embedding.rs:13`): weightless
  RMSNorm + linear projection into text hidden space (shared by vision
  and audio).

Every linear is "clippable" (`ClippableLinear`, vision.rs:32): optional
scalar input/output clamps stored alongside the weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

_UNIFIED_EPS = 1e-5


@dataclass(frozen=True)
class Gemma4VisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 72
    hidden_activation: str = "gelu_pytorch_tanh"
    rms_norm_eps: float = 1e-6
    patch_size: int = 14
    position_embedding_size: int = 1024
    pooling_kernel_size: int = 2
    default_output_length: int = 256
    standardize: bool = False
    rope_theta: float = 100.0
    unified: bool = False

    @classmethod
    def from_hf(cls, d: Mapping[str, Any], unified: bool = False):
        rp = d.get("rope_parameters") or {}
        theta = (rp.get("full_attention") or {}).get("rope_theta") or \
            rp.get("rope_theta") or 100.0
        return cls(
            hidden_size=d.get("mm_embed_dim") or d.get("hidden_size", 1152),
            intermediate_size=d.get("intermediate_size", 4304),
            num_hidden_layers=d.get("num_hidden_layers", 27),
            num_attention_heads=d.get("num_attention_heads", 16),
            num_key_value_heads=d.get("num_key_value_heads", 16),
            head_dim=d.get("head_dim", 72),
            hidden_activation=d.get("hidden_activation",
                                    "gelu_pytorch_tanh"),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            patch_size=d.get("patch_size", 14),
            position_embedding_size=(
                d.get("position_embedding_size")
                or d.get("mm_posemb_size") or 1024),
            pooling_kernel_size=d.get("pooling_kernel_size", 2),
            default_output_length=(
                d.get("default_output_length")
                or d.get("num_soft_tokens") or 256),
            standardize=d.get("standardize", False),
            rope_theta=float(theta),
            unified=unified,
        )


def _act(name):
    if name in ("gelu_pytorch_tanh", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    return jax.nn.silu


def _rms(x, w=None, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if w is not None:
        n = n * (1.0 + w.astype(jnp.float32))
    return n.astype(x.dtype)


def _v_norm(v, eps):
    """Pure RMS without learned weight (vision.rs:21)."""
    vf = v.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(vf * vf, axis=-1, keepdims=True) + eps)
    return (vf / rms).astype(v.dtype)


def _layer_norm(x, w, b, eps=_UNIFIED_EPS):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(
        x.dtype)


def _clip_linear(x, lw):
    """ClippableLinear (vision.rs:32): optional scalar in/out clamps."""
    if lw.get("in_min") is not None:
        x = jnp.clip(x, lw["in_min"], lw["in_max"])
    out = x @ lw["w"].T
    if lw.get("b") is not None:
        out = out + lw["b"]
    if lw.get("out_min") is not None:
        out = jnp.clip(out, lw["out_min"], lw["out_max"])
    return out


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[C, H, W] → [ph·pw, ps·ps·C] (vision.rs:232 patchify permutation)."""
    c, h, w = pixel_values.shape
    ps = patch_size
    ph, pw = h // ps, w // ps
    x = pixel_values.reshape(c, ph, ps, pw, ps)
    x = jnp.transpose(x, (1, 3, 2, 4, 0))  # [ph, pw, ps, ps, c]
    return x.reshape(ph * pw, ps * ps * c)


def patch_positions(ph: int, pw: int) -> np.ndarray:
    """[(col, row)] per patch, row-major (vision.rs encode_single)."""
    cols, rows = np.meshgrid(np.arange(pw), np.arange(ph))
    return np.stack([cols.reshape(-1), rows.reshape(-1)], axis=-1)


def _rope_2d(positions, head_dim: int, theta: float):
    """cos/sin [n, head_dim]: per-axis frequencies, cat(freqs, freqs) per
    axis slice (VisionRotaryEmbedding, vision.rs:138; ndim = 2)."""
    dpd = head_dim // 2
    half = dpd // 2
    inv = 1.0 / (theta ** (2.0 * np.arange(half) / dpd))
    parts = []
    for d in range(2):
        f = positions[:, d].astype(jnp.float32)[:, None] * inv[None]
        parts.append(jnp.concatenate([f, f], axis=-1))  # [n, dpd]
    emb = jnp.concatenate(parts, axis=-1)  # [n, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope_2d(x, cos, sin):
    """x [n, heads, head_dim]; rotate-half WITHIN each axis slice
    (apply_2d_rope, vision.rs:187)."""
    hd = x.shape[-1]
    dpd = hd // 2
    outs = []
    for d in range(2):
        xs = x[..., d * dpd:(d + 1) * dpd]
        cs = cos[:, None, d * dpd:(d + 1) * dpd]
        sn = sin[:, None, d * dpd:(d + 1) * dpd]
        h = dpd // 2
        rot = jnp.concatenate([-xs[..., h:], xs[..., :h]], axis=-1)
        outs.append(xs * cs + rot * sn)
    return jnp.concatenate(outs, axis=-1)


def _encoder_layer(cfg: Gemma4VisionConfig, lw, x, cos, sin):
    """Sandwich-norm encoder layer (vision.rs:483): softmax scale 1.0,
    q/k RMSNorm, weightless v-norm, full bidirectional attention."""
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    n = x.shape[0]
    res = x
    h = _rms(x, lw["input_ln"], cfg.rms_norm_eps)
    q = _clip_linear(h, lw["q"]).reshape(n, nh, hd)
    k = _clip_linear(h, lw["k"]).reshape(n, nkv, hd)
    v = _clip_linear(h, lw["v"]).reshape(n, nkv, hd)
    q = _rms(q, lw["q_norm"], cfg.rms_norm_eps)
    k = _rms(k, lw["k_norm"], cfg.rms_norm_eps)
    v = _v_norm(v, cfg.rms_norm_eps)
    q = _apply_rope_2d(q, cos, sin)
    k = _apply_rope_2d(k, cos, sin)
    group = nh // nkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    # softmax scale 1.0 (SdpaParams, vision.rs:352)
    scores = jnp.einsum("qnd,knd->nqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("nqk,knd->qnd", probs, v.astype(jnp.float32))
    attn = attn.reshape(n, nh * hd).astype(x.dtype)
    attn = _clip_linear(attn, lw["o"])
    h = res + _rms(attn, lw["post_attn_ln"], cfg.rms_norm_eps)
    res = h
    m = _rms(h, lw["pre_ff_ln"], cfg.rms_norm_eps)
    act = _act(cfg.hidden_activation)
    m = _clip_linear(
        act(_clip_linear(m, lw["gate"])) * _clip_linear(m, lw["up"]),
        lw["down"])
    return res + _rms(m, lw["post_ff_ln"], cfg.rms_norm_eps)


def _pool_by_positions(x, positions, output_length: int):
    """Position-binned average pooling (VisionPooler, vision.rs:566):
    bin = floor(col/k) + floor((max_col+1)/k)·floor(row/k), scatter-add of
    x/k² — exact k×k average pooling expressed through patch positions."""
    n, dim = x.shape
    k = int(np.sqrt(n / output_length))
    col = positions[:, 0].astype(jnp.float32)
    row = positions[:, 1].astype(jnp.float32)
    stride = jnp.floor((jnp.max(col) + 1.0) / k)
    bins = (jnp.floor(col / k) + stride * jnp.floor(row / k)).astype(jnp.int32)
    out = jnp.zeros((output_length, dim), jnp.float32).at[bins].add(
        x.astype(jnp.float32) / (k * k))
    return out.astype(x.dtype)


def vision_tower_encode(weights: dict, cfg: Gemma4VisionConfig,
                        pixel_values: jax.Array) -> jax.Array:
    """Encode ONE image [C, H, W] → pooled tokens [n_out, hidden] in tower
    space (VisionTower::encode_single + forward, vision.rs:845-915).
    Project into text space with `multimodal_embed`."""
    ps = cfg.patch_size
    c, h, w = pixel_values.shape
    ph, pw = h // ps, w // ps
    patches = patchify(pixel_values, ps)
    patches = (patches - 0.5) * 2.0  # scale to [−1, 1]
    pos = jnp.asarray(patch_positions(ph, pw))
    x = _clip_linear(patches, weights["patch_proj"])
    table = weights["pos_table"]  # [2, P, hidden]
    x = x + table[0][pos[:, 0]] + table[1][pos[:, 1]]
    cos, sin = _rope_2d(pos, cfg.head_dim, cfg.rope_theta)
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    for lw in weights["layers"]:
        x = _encoder_layer(cfg, lw, x, cos, sin)
    k = cfg.pooling_kernel_size
    out_len = (ph * pw) // (k * k)
    x = _pool_by_positions(x, pos, out_len)
    x = x * jnp.asarray(np.sqrt(cfg.hidden_size), x.dtype)
    if weights.get("std_bias") is not None:
        x = (x - weights["std_bias"]) * weights["std_scale"]
    return x


def multimodal_embed(weights: dict, feats: jax.Array,
                     eps: float = 1e-6) -> jax.Array:
    """Gemma4MultimodalEmbedder (multimodal_embedding.rs:13): weightless
    RMSNorm → linear into text hidden."""
    return _rms(feats, None, eps) @ weights["proj"].T


def unified_vision_embed(weights: dict, cfg: Gemma4VisionConfig,
                         patches: jax.Array,
                         position_ids: jax.Array) -> jax.Array:
    """UnifiedVisionEmbedder::encode_single (vision.rs:782): patches are
    pre-extracted [n, ps²·3]; position_ids [n, 2] with −1 marking padding.
    Returns the VALID tokens projected into text space."""
    x = _layer_norm(patches, weights["ln1_w"], weights["ln1_b"])
    x = x @ weights["dense_w"].T + weights["dense_b"]
    x = _layer_norm(x, weights["ln2_w"], weights["ln2_b"])
    clamped = jnp.clip(position_ids, 0, cfg.position_embedding_size - 1)
    table = weights["pos_table"]  # [2, P, hidden]
    pos_emb = table[0][clamped[:, 0]] + table[1][clamped[:, 1]]
    pad = (position_ids[:, 0] == -1)[:, None]
    x = x + jnp.where(pad, 0.0, pos_emb)
    x = _layer_norm(x, weights["pos_norm_w"], weights["pos_norm_b"])
    x = multimodal_embed(weights["embedder"], x, cfg.rms_norm_eps)
    return x, ~pad[:, 0]


def _clip_lw(g, prefix, optional_bias=True):
    lw = {"w": g(prefix + ".weight")}
    if g(prefix + ".linear.weight", optional=True) is not None:
        lw["w"] = g(prefix + ".linear.weight")
        b = g(prefix + ".linear.bias", optional=True)
    else:
        b = g(prefix + ".bias", optional=True)
    if b is not None:
        lw["b"] = b
    for key, name in (("in_min", "input_min"), ("in_max", "input_max"),
                      ("out_min", "output_min"), ("out_max", "output_max")):
        v = g(prefix + "." + name, optional=True)
        if v is not None:
            lw[key] = float(np.asarray(v))
    return lw


def vision_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Gemma4VisionConfig,
    dtype=jnp.float32, prefix: str = "model.vision_tower.",
) -> dict:
    def g(name, optional=False):
        arr = sd.get(prefix + name)
        if arr is None:
            if optional:
                return None
            raise KeyError(prefix + name)
        return jnp.asarray(np.asarray(arr, np.float32), dtype)

    w = {
        "patch_proj": _clip_lw(g, "patch_embedder.input_proj"),
        "pos_table": g("patch_embedder.position_embedding_table"),
        "std_bias": g("std_bias", optional=True),
        "std_scale": g("std_scale", optional=True),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        w["layers"].append({
            "input_ln": g(p + "input_layernorm.weight"),
            "post_attn_ln": g(p + "post_attention_layernorm.weight"),
            "pre_ff_ln": g(p + "pre_feedforward_layernorm.weight"),
            "post_ff_ln": g(p + "post_feedforward_layernorm.weight"),
            "q": _clip_lw(g, p + "self_attn.q_proj"),
            "k": _clip_lw(g, p + "self_attn.k_proj"),
            "v": _clip_lw(g, p + "self_attn.v_proj"),
            "o": _clip_lw(g, p + "self_attn.o_proj"),
            "q_norm": g(p + "self_attn.q_norm.weight"),
            "k_norm": g(p + "self_attn.k_norm.weight"),
            "gate": _clip_lw(g, p + "mlp.gate_proj"),
            "up": _clip_lw(g, p + "mlp.up_proj"),
            "down": _clip_lw(g, p + "mlp.down_proj"),
        })
    return w


def embedder_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], dtype=jnp.float32,
    prefix: str = "model.embed_vision.",
) -> dict:
    return {
        "proj": jnp.asarray(
            np.asarray(sd[prefix + "embedding_projection.weight"],
                       np.float32), dtype),
    }
