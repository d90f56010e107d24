"""MobileNetV5 vision tower for Gemma 3n — a native JAX/NHWC
implementation of the timm `mobilenetv5_300m` backbone the reference
builds in `mistralrs-core/src/vision_models/gemma3n/vision.rs` (stem →
4 stages of EdgeResidual / UniversalInvertedResidual / MobileAttention
blocks → multi-scale fusion adapter → [B, 16·16, 2048] features), plus
the Gemma3n vision multimodal embedder
(`vision_models/gemma3n/multimodal_embedding.rs`).

Design notes (TPU-first):
* NHWC layout throughout — `lax.conv_general_dilated` with HWIO kernels
  maps channels onto the 128-lane axis (timm checkpoints store OIHW and
  are transposed at load).
* "same" padding reproduces timm's asymmetric `pad_same` exactly
  (ceil-mode output, bottom/right-heavy padding) — XLA's SAME would
  differ for even kernels/strides.
* RMSNormAct2d is a channel-last RMS norm (plain weight, NOT the gemma
  (1+w) variant) + optional exact GELU.
* MultiQueryAttention2d is MQA with a single shared K/V head over the
  flattened spatial axis (optionally kv-strided via a depthwise
  down-conv); it lowers to two batched einsums on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

INPUT_CHANNELS = 3
STEM_OUT_CHANNELS = 64
MSFA_IN_CHANNELS = (640, 1280)
MSFA_OUT_CHANNELS = 2048
MSFA_EXPANSION_RATIO = 2.0


def make_divisible(v: float, divisor: int = 8) -> int:
    """timm's channel rounding (vision.rs:738)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# -- block definition --------------------------------------------------------

@dataclass(frozen=True)
class Edge:  # EdgeResidual
    out: int
    kernel: int
    stride: int
    expand: float


@dataclass(frozen=True)
class Uir:  # UniversalInvertedResidual
    out: int
    start_k: int
    mid_k: int
    stride: int
    expand: float


@dataclass(frozen=True)
class Mqa:  # MobileAttention (MultiQueryAttention2d)
    heads: int
    kv_dim: int
    kv_stride: int


def gemma3n_mobilenet_def() -> tuple[tuple[Any, ...], ...]:
    """The mobilenetv5_300m stage table (vision.rs:850)."""
    s1 = (Edge(128, 3, 2, 4.0), Edge(128, 3, 1, 4.0), Edge(128, 3, 1, 4.0))
    s2 = (
        Uir(256, 3, 5, 2, 6.0), Uir(256, 5, 0, 1, 4.0), Uir(256, 3, 0, 1, 4.0),
        Uir(256, 5, 0, 1, 4.0), Uir(256, 3, 0, 1, 4.0),
    )
    s3 = [Uir(640, 5, 5, 2, 6.0)]
    s3 += [Uir(640, 5, 0, 1, 4.0)] * 7
    s3 += [Uir(640, 0, 0, 1, 1.0)]
    for _ in range(14):
        s3 += [Mqa(12, 64, 2), Uir(640, 0, 0, 1, 2.0)]
    s4 = [Uir(1280, 5, 5, 2, 6.0)]
    for _ in range(19):
        s4 += [Mqa(16, 96, 1), Uir(1280, 0, 0, 1, 2.0)]
    return (s1, tuple(s2), tuple(s3), tuple(s4))


# -- primitives --------------------------------------------------------------

def _pad_same(x, kernel: int, stride: int, dilation: int = 1):
    """timm pad_same on NHWC (asymmetric, bottom/right heavy)."""
    ih, iw = x.shape[1], x.shape[2]
    eff = dilation * (kernel - 1) + 1
    oh, ow = -(-ih // stride), -(-iw // stride)
    ph = max((oh - 1) * stride + eff - ih, 0)
    pw = max((ow - 1) * stride + eff - iw, 0)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
    return x


def conv2d(x, w, stride: int = 1, groups: int = 1, bias=None,
           same: bool = True, dilation: int = 1):
    """NHWC conv; ``w`` is HWIO [kh, kw, in/groups, out]."""
    k = w.shape[0]
    if same and k > 1:
        x = _pad_same(x, k, stride, dilation)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def rms_norm_2d(x, w, eps: float, act: bool):
    """Channel-last RMS norm (plain weight) + optional exact GELU
    (RMSNormAct2d, vision.rs:136)."""
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    n = n * w.astype(jnp.float32)
    if act:
        n = jax.nn.gelu(n, approximate=False)
    return n.astype(x.dtype)


def _cna(x, lw, prefix, stride=1, groups=1, act=True, eps=1e-5):
    """ConvNormAct: conv (same padding) → RMSNormAct2d."""
    x = conv2d(x, lw[prefix + ".conv"], stride=stride, groups=groups,
               bias=lw.get(prefix + ".conv_bias"))
    return rms_norm_2d(x, lw[prefix + ".bn"], eps, act)


def _edge_residual(x, lw, blk: Edge):
    shortcut = x
    in_ch = x.shape[-1]
    y = conv2d(x, lw["conv_exp"], stride=blk.stride)
    y = rms_norm_2d(y, lw["bn1"], 1e-5, True)
    y = conv2d(y, lw["conv_pwl"], same=False)
    y = rms_norm_2d(y, lw["bn2"], 1e-5, False)
    if in_ch == blk.out and blk.stride == 1:
        y = y + shortcut
    return y


def _uir(x, lw, blk: Uir):
    shortcut = x
    in_ch = x.shape[-1]
    y = x
    if blk.start_k > 0:
        s = 1 if blk.mid_k > 0 else blk.stride
        y = _cna(y, lw, "dw_start", stride=s, groups=in_ch, act=False)
    mid = y.shape[-1]
    y = _cna(y, lw, "pw_exp", act=True)
    if blk.mid_k > 0:
        y = _cna(y, lw, "dw_mid", stride=blk.stride, groups=y.shape[-1],
                 act=True)
    y = _cna(y, lw, "pw_proj", act=False)
    if "layer_scale" in lw:
        y = y * lw["layer_scale"].astype(y.dtype)
    if in_ch == blk.out and blk.stride == 1:
        y = y + shortcut
    return y


def _mqa_2d(x, lw, blk: Mqa):
    """MobileAttention: pre-norm → MultiQueryAttention2d → layer scale →
    skip (vision.rs:486-736). K/V are single-headed (MQA)."""
    shortcut = x
    b, h, w, c = x.shape
    y = rms_norm_2d(x, lw["norm"], 1e-5, False)
    kd = blk.kv_dim
    q = conv2d(y, lw["q_proj"], same=False)  # [B, H, W, heads*kd]
    q = q.reshape(b, h * w, blk.heads, kd)

    k = v = y
    if blk.kv_stride > 1:
        k = conv2d(k, lw["k_down"], stride=blk.kv_stride, groups=c)
        k = rms_norm_2d(k, lw["k_down_norm"], 1e-6, False)
        v = conv2d(v, lw["v_down"], stride=blk.kv_stride, groups=c)
        v = rms_norm_2d(v, lw["v_down_norm"], 1e-6, False)
    k = conv2d(k, lw["k_proj"], same=False).reshape(b, -1, kd)
    v = conv2d(v, lw["v_proj"], same=False).reshape(b, -1, kd)

    scores = jnp.einsum(
        "bqnd,bkd->bnqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (kd ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bnqk,bkd->bqnd", probs, v.astype(jnp.float32))
    o = o.reshape(b, h, w, blk.heads * kd).astype(x.dtype)
    o = conv2d(o, lw["o_proj"], same=False)
    if "layer_scale" in lw:
        o = o * lw["layer_scale"].astype(o.dtype)
    return o + shortcut  # stride 1, in==out → always skip


def _nearest_upsample(x, oh: int, ow: int):
    b, h, w, c = x.shape
    ri = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    ci = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, ri][:, :, ci]


def _avg_pool(x, sh: int, sw: int):
    b, h, w, c = x.shape
    return x.reshape(b, h // sh, sh, w // sw, sw, c).mean(axis=(2, 4))


def _msfa(lw, feats: Sequence[jax.Array], out_res: tuple[int, int]):
    """Multi-scale fusion adapter: nearest-upsample to the finest grid,
    channel concat, UIR ffn, pool to out_res, final norm."""
    h0, w0 = feats[0].shape[1], feats[0].shape[2]
    ups = [
        f if (f.shape[1] >= h0 and f.shape[2] >= w0)
        else _nearest_upsample(f, h0, w0)
        for f in feats
    ]
    x = jnp.concatenate(ups, axis=-1)
    x = _cna(x, lw, "ffn.pw_exp", act=True)
    x = _cna(x, lw, "ffn.pw_proj", act=False)
    oh, ow = out_res
    if (h0, w0) != (oh, ow):
        if h0 % oh == 0 and w0 % ow == 0:
            x = _avg_pool(x, h0 // oh, w0 // ow)
        else:
            x = _nearest_upsample(x, oh, ow)
    return rms_norm_2d(x, lw["norm"], 1e-6, False)


# -- weights -----------------------------------------------------------------

def _hwio(arr: np.ndarray) -> np.ndarray:
    """timm OIHW → HWIO."""
    return np.transpose(np.asarray(arr, np.float32), (2, 3, 1, 0))


def mobilenetv5_weights_from_state_dict(
    sd: Mapping[str, np.ndarray],
    prefix: str = "model.vision_tower.timm_model.",
    block_def=None,
    dtype=jnp.float32,
) -> dict:
    """Load a timm mobilenetv5 checkpoint slice into the tower pytree."""
    block_def = block_def or gemma3n_mobilenet_def()

    def g(name, conv=False, optional=False):
        arr = sd.get(prefix + name)
        if arr is None:
            if optional:
                return None
            raise KeyError(prefix + name)
        a = _hwio(arr) if conv else np.asarray(arr, np.float32)
        return jnp.asarray(a, dtype)

    def cna(out, key, src):
        out[key + ".conv"] = g(src + ".conv.weight", conv=True)
        b = g(src + ".conv.bias", optional=True)
        if b is not None:
            out[key + ".conv_bias"] = b
        out[key + ".bn"] = g(src + ".bn.weight")

    weights: dict[str, Any] = {"stem": {}}
    cna(weights["stem"], "conv_stem", "conv_stem")
    stages = []
    for si, stage in enumerate(block_def):
        blocks = []
        for bi, blk in enumerate(stage):
            p = f"blocks.{si}.{bi}."
            lw: dict[str, Any] = {}
            if isinstance(blk, Edge):
                lw["conv_exp"] = g(p + "conv_exp.weight", conv=True)
                lw["bn1"] = g(p + "bn1.weight")
                lw["conv_pwl"] = g(p + "conv_pwl.weight", conv=True)
                lw["bn2"] = g(p + "bn2.weight")
            elif isinstance(blk, Uir):
                if blk.start_k > 0:
                    cna(lw, "dw_start", p + "dw_start")
                cna(lw, "pw_exp", p + "pw_exp")
                if blk.mid_k > 0:
                    cna(lw, "dw_mid", p + "dw_mid")
                cna(lw, "pw_proj", p + "pw_proj")
                ls = g(p + "layer_scale.gamma", optional=True)
                if ls is not None:
                    lw["layer_scale"] = ls
            else:  # Mqa
                lw["norm"] = g(p + "norm.weight")
                lw["q_proj"] = g(p + "attn.query.proj.weight", conv=True)
                if blk.kv_stride > 1:
                    lw["k_down"] = g(p + "attn.key.down_conv.weight", conv=True)
                    lw["k_down_norm"] = g(p + "attn.key.norm.weight")
                    lw["v_down"] = g(p + "attn.value.down_conv.weight", conv=True)
                    lw["v_down_norm"] = g(p + "attn.value.norm.weight")
                lw["k_proj"] = g(p + "attn.key.proj.weight", conv=True)
                lw["v_proj"] = g(p + "attn.value.proj.weight", conv=True)
                lw["o_proj"] = g(p + "attn.output.proj.weight", conv=True)
                ls = g(p + "layer_scale.gamma", optional=True)
                if ls is not None:
                    lw["layer_scale"] = ls
            blocks.append(lw)
        stages.append(blocks)
    weights["stages"] = stages
    msfa: dict[str, Any] = {}
    cna(msfa, "ffn.pw_exp", "msfa.ffn.pw_exp")
    cna(msfa, "ffn.pw_proj", "msfa.ffn.pw_proj")
    msfa["norm"] = g("msfa.norm.weight")
    weights["msfa"] = msfa
    return weights


def vision_tower_forward(
    weights: dict,
    pixels: jax.Array,  # [B, H, W, 3] normalized
    block_def=None,
    msfa_indices: Sequence[int] = (3, 4),
    out_res: tuple[int, int] = (16, 16),
) -> jax.Array:
    """Full tower: stem → stages (collecting multi-scale feats) → MSFA.
    Returns [B, out_h*out_w, MSFA_OUT_CHANNELS] channel-last features."""
    block_def = block_def or gemma3n_mobilenet_def()
    x = _cna(pixels, weights["stem"], "conv_stem", stride=2, act=True)
    feats = []
    for si, stage in enumerate(block_def):
        for bi, blk in enumerate(stage):
            lw = weights["stages"][si][bi]
            if isinstance(blk, Edge):
                x = _edge_residual(x, lw, blk)
            elif isinstance(blk, Uir):
                x = _uir(x, lw, blk)
            else:
                x = _mqa_2d(x, lw, blk)
        if (si + 1) in msfa_indices:
            feats.append(x)
    x = _msfa(weights["msfa"], feats, out_res)
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


# -- Gemma3n vision embedder --------------------------------------------------

def gemma3n_vision_embedder_from_state_dict(
    sd: Mapping[str, np.ndarray],
    prefix: str = "model.embed_vision.",
    dtype=jnp.float32,
) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(sd[prefix + name], np.float32), dtype)

    return {
        "embed_soft_norm": g("soft_embedding_norm.weight"),
        "embed_proj": g("embedding_projection.weight"),
        "embed_table": g("embedding.weight"),
        "embed_hard_norm": g("hard_embedding_norm.weight"),
    }


def embed_vision_soft(embedder: dict, soft: jax.Array, eps=1e-6) -> jax.Array:
    """Soft path of the vision multimodal embedder: rms-norm → projection →
    unscaled rms-norm into the decoder space (multimodal_embedding.rs)."""
    from ..audio.gemma3n import embed_audio_soft

    return embed_audio_soft(embedder, 0, soft, eps)
