"""Gemma 4 audio encoder — SSCP conv subsampling + USM conformer.

TPU-native implementation of the reference's Gemma 4 audio tower
(`mistralrs-core/src/vision_models/gemma4/audio.rs:1-1227`), reference-spec
protocol (no public HF class ships for this family). Same Google-USM
lineage as the Gemma 3n conformer (`audio/gemma3n.py`) with the Gemma 4
deltas:

* SSCP blocks use **affine-less LayerNorm** over channels with semicausal
  time padding (audio.rs:332-444) instead of 3n's cumulative group norm.
* Attention scales: ``q · hd^-0.5/ln2 · softplus(per_dim_scale)`` AND
  ``k · ln(1+e)/ln2`` (audio.rs:546-547); relative position projection is
  named ``relative_k_proj`` (audio.rs:40); local chunked attention masks
  by the subsampled VALIDITY mask, not just sequence length.
* Conformer feed-forwards weigh their residual by ``conf_residual_weight``
  and every junction clamps at ``gradient_clipping`` (audio.rs:861-912).
* Optional ``conf_reduction_factor`` stride subsampling and
  ``output_proj`` after the stack (audio.rs:1063-1128).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Gemma4AudioConfig:
    input_feat_size: int = 128
    hidden_size: int = 1024
    output_proj_dims: int | None = 1536
    conf_attention_chunk_size: int = 12
    conf_attention_context_left: int = 13
    conf_attention_context_right: int = 0
    conf_attention_logit_cap: float = 50.0
    conf_num_attention_heads: int = 8
    conf_num_hidden_layers: int = 12
    conf_conv_kernel_size: int = 5
    conf_reduction_factor: int = 1
    conf_residual_weight: float = 0.5
    sscp_conv_channel_size: tuple = (128, 32)
    sscp_conv_kernel_size: tuple = ((3, 3), (3, 3))
    sscp_conv_stride_size: tuple = ((2, 2), (2, 2))
    rms_norm_eps: float = 1e-6
    gradient_clipping: float = 1e10

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.conf_num_attention_heads

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Gemma4AudioConfig":
        def t2(v):
            return tuple(tuple(x) for x in v)

        return cls(
            input_feat_size=d.get("input_feat_size", 128),
            hidden_size=d.get("hidden_size", 1024),
            output_proj_dims=d.get("output_proj_dims", 1536),
            conf_attention_chunk_size=d.get("conf_attention_chunk_size", 12),
            conf_attention_context_left=d.get(
                "conf_attention_context_left", 13),
            conf_attention_context_right=d.get(
                "conf_attention_context_right", 0),
            conf_attention_logit_cap=d.get("conf_attention_logit_cap", 50.0),
            conf_num_attention_heads=d.get("conf_num_attention_heads", 8),
            conf_num_hidden_layers=d.get("conf_num_hidden_layers", 12),
            conf_conv_kernel_size=d.get("conf_conv_kernel_size", 5),
            conf_reduction_factor=d.get("conf_reduction_factor", 1),
            conf_residual_weight=d.get("conf_residual_weight", 0.5),
            sscp_conv_channel_size=tuple(
                d.get("sscp_conv_channel_size", (128, 32))),
            sscp_conv_kernel_size=t2(
                d.get("sscp_conv_kernel_size", ((3, 3), (3, 3)))),
            sscp_conv_stride_size=t2(
                d.get("sscp_conv_stride_size", ((2, 2), (2, 2)))),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            gradient_clipping=d.get("gradient_clipping", 1e10),
        )


def _rms(x, w=None, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if w is not None:
        n = n * (1.0 + w.astype(jnp.float32))
    return n.astype(x.dtype)


def _ln_affineless(x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _clip_linear(x, lw):
    if lw.get("in_min") is not None:
        x = jnp.clip(x, lw["in_min"], lw["in_max"])
    out = x @ lw["w"].T
    if lw.get("out_min") is not None:
        out = jnp.clip(out, lw["out_min"], lw["out_max"])
    return out


def _sscp_block(cfg, x, mask, wconv, stride_t):
    """x [B, C_in, T, F], mask [B, T] (1 = PAD). Semicausal pads, conv2d
    (no bias), affine-less LayerNorm over channels, relu; mask subsampled
    at the time stride (audio.rs:418-444)."""
    valid = (mask == 0).astype(x.dtype)[:, None, :, None]
    x = x * valid
    kt = wconv.shape[2]
    half = kt // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (half, half), (1, 1)))
    out = jax.lax.conv_general_dilated(
        x, wconv, window_strides=(stride_t, stride_t), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    # subsample the pad mask at the conv's time stride
    t_out = out.shape[2]
    idx = jnp.minimum(jnp.arange(t_out) * stride_t, mask.shape[1] - 1)
    mask = mask[:, idx]
    out = jnp.transpose(out, (0, 2, 3, 1))  # channel-last for the norm
    out = _ln_affineless(out, cfg.rms_norm_eps)
    out = jax.nn.relu(jnp.transpose(out, (0, 3, 1, 2)))
    return out, mask


def _chunk_blocks(x, w):
    b, tt = x.shape[:2]
    u = -(-tt // w)
    pad = u * w - tt
    x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x.reshape((b, u, w) + x.shape[2:])


def _chunk_context(x, w, left, right):
    b, tt = x.shape[:2]
    u = -(-tt // w)
    x = jnp.pad(
        x, ((0, 0), (left, u * w - tt + right)) + ((0, 0),) * (x.ndim - 2))
    ctx = w + left + right
    starts = jnp.arange(u) * w
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(x, s, ctx, axis=1)
         for s in np.arange(u) * w], axis=1)


def _conformer_attention(cfg, lw, x, mask):
    """Local chunked attention with sinusoidal relative positions
    (audio.rs:506-813): q · hd^-0.5/ln2 · softplus(per_dim_scale),
    k · ln(1+e)/ln2, logit softcap, validity from the subsampled mask plus
    the local causal window."""
    b, tt, d = x.shape
    nh, hd = cfg.conf_num_attention_heads, cfg.head_dim
    w = cfg.conf_attention_chunk_size
    left = max(0, cfg.conf_attention_context_left - 1)
    right = cfg.conf_attention_context_right
    ctx = w + left + right
    span = left + right + 1

    q = _clip_linear(x, lw["q"]).reshape(b, tt, nh, hd).astype(jnp.float32)
    k = _clip_linear(x, lw["k"]).reshape(b, tt, nh, hd).astype(jnp.float32)
    v = _clip_linear(x, lw["v"]).reshape(b, tt, nh, hd).astype(jnp.float32)
    q_scale = (hd ** -0.5) / np.log(2.0)
    k_scale = np.log1p(np.e) / np.log(2.0)
    q = q * q_scale * jax.nn.softplus(
        lw["per_dim_scale"].astype(jnp.float32))
    k = k * k_scale

    qb = _chunk_blocks(q, w)  # [B, U, W, N, H]
    kb = _chunk_context(k, w, left, right)  # [B, U, C, N, H]
    vb = _chunk_context(v, w, left, right)
    u = qb.shape[1]

    # sinusoidal timing signal over relative offsets → relative_k_proj
    pos = np.arange(left, -right - 1, -1, dtype=np.float32)  # [span]
    n_ts = d // 2
    log_inc = np.log(1e4) / max(n_ts - 1, 1)
    inv_ts = np.exp(np.arange(n_ts) * -log_inc)
    scaled = pos[:, None] * inv_ts[None]
    timing = np.concatenate([np.sin(scaled), np.cos(scaled)], -1)
    sin_emb = (jnp.asarray(timing, jnp.float32)
               @ lw["pos_proj"].astype(jnp.float32).T).reshape(span, nh, hd)

    term_ac = jnp.einsum("buwnh,bucnh->bnuwc", qb, kb)
    term_bd = jnp.einsum("buwnh,fnh->bnuwf", qb, sin_emb)
    pad = ctx + 1 - span
    term_bd = jnp.pad(term_bd, ((0, 0),) * 4 + ((0, pad),))
    term_bd = term_bd.reshape(b, nh, u, w * (ctx + 1))[..., : w * ctx]
    term_bd = term_bd.reshape(b, nh, u, w, ctx)
    logits = term_ac + term_bd
    cap = cfg.conf_attention_logit_cap
    logits = jnp.tanh(logits / cap) * cap

    # validity: the frame exists AND is not padding AND local causal window
    qpos = jnp.arange(u)[:, None] * w + jnp.arange(w)[None, :]
    kpos = jnp.arange(u)[:, None] * w - left + jnp.arange(ctx)[None, :]
    in_seq = (kpos >= 0) & (kpos < tt)  # [U, C]
    kpos_c = jnp.clip(kpos, 0, tt - 1)
    not_pad = (mask[:, kpos_c.reshape(-1)] == 0).reshape(b, u, ctx)
    causal = (
        (kpos[:, None, :] <= qpos[:, :, None] + right)
        & (kpos[:, None, :] >= qpos[:, :, None] - left)
    )  # [U, W, C]
    full = (in_seq[None, :, None, :] & not_pad[:, :, None, :]
            & causal[None])  # [B, U, W, C]
    logits = jnp.where(full[:, None], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnuwc,bucnh->buwnh", probs, vb)
    return out.reshape(b, u * w, nh * hd)[:, :tt].astype(x.dtype)


def gemma4_audio_encode(weights: dict, cfg: Gemma4AudioConfig,
                        mel: jax.Array, mel_mask: jax.Array):
    """mel [B, T, F] log-mel features, mel_mask [B, T] (1 = PAD). Returns
    (features [B, T', D_out], mask [B, T']) — AudioModel::forward
    (audio.rs:1063)."""
    gc = cfg.gradient_clipping
    x = mel[:, None]  # [B, 1, T, F]
    mask = mel_mask
    for i in range(2):
        x, mask = _sscp_block(
            cfg, x, mask, weights[f"sscp{i}_conv"],
            cfg.sscp_conv_stride_size[i][0])
    b, c, t, f = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, f * c)
    x = x @ weights["input_proj"].T

    def ffw(x, lw):
        res = x
        h = _rms(jnp.clip(x, -gc, gc), lw["pre_ln"], cfg.rms_norm_eps)
        h = jax.nn.silu(_clip_linear(h, lw["w1"]))
        h = jnp.clip(_clip_linear(h, lw["w2"]), -gc, gc)
        h = _rms(h, lw["post_ln"], cfg.rms_norm_eps)
        return res + h * cfg.conf_residual_weight

    for lw in weights["layers"]:
        x = ffw(x, lw["ffw1"])
        # attention sub-block
        res = x
        h = _rms(jnp.clip(x, -gc, gc), lw["pre_attn_norm"], cfg.rms_norm_eps)
        h = _conformer_attention(cfg, lw, h, mask)
        h = jnp.clip(_clip_linear(h, lw["post"]), -gc, gc)
        x = res + _rms(h, lw["post_attn_norm"], cfg.rms_norm_eps)
        # light conv
        res = x
        h = _rms(x, lw["lconv_pre_ln"], cfg.rms_norm_eps)
        h = _clip_linear(h, lw["lconv_start"])
        half = h.shape[-1] // 2
        h = h[..., :half] * jax.nn.sigmoid(h[..., half:])
        hk = lw["lconv_depthwise"]  # [D, 1, K] depthwise
        kK = hk.shape[-1]
        hc = jnp.pad(jnp.swapaxes(h, 1, 2), ((0, 0), (0, 0), (kK - 1, 0)))
        hc = jax.lax.conv_general_dilated(
            hc.astype(jnp.float32), hk.astype(jnp.float32),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=hc.shape[1],
        ).astype(h.dtype)
        h = jnp.clip(jnp.swapaxes(hc, 1, 2), -gc, gc)
        h = jax.nn.silu(_rms(h, lw["lconv_norm"], cfg.rms_norm_eps))
        x = res + _clip_linear(h, lw["lconv_end"])
        x = jnp.clip(ffw(x, lw["ffw2"]), -gc, gc)
        x = _rms(x, lw["norm_out"], cfg.rms_norm_eps)

    if cfg.conf_reduction_factor > 1:
        s = cfg.conf_reduction_factor
        idx = jnp.arange(0, x.shape[1], s)
        x = x[:, idx]
        mask = mask[:, idx]
    if weights.get("output_proj") is not None:
        x = x @ weights["output_proj"].T + weights["output_proj_b"]
    x = jnp.where((mask == 0)[..., None], x, 0.0)
    return x, mask


def gemma4_audio_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Gemma4AudioConfig,
    dtype=jnp.float32, prefix: str = "model.audio_tower.",
) -> dict:
    def g(name, optional=False):
        arr = sd.get(prefix + name)
        if arr is None:
            if optional:
                return None
            raise KeyError(prefix + name)
        return jnp.asarray(np.asarray(arr, np.float32), dtype)

    def clip_lw(p):
        lw = {"w": g(p + ".weight")}
        for key, name in (("in_min", "input_min"), ("in_max", "input_max"),
                          ("out_min", "output_min"),
                          ("out_max", "output_max")):
            v = g(p + "." + name, optional=True)
            if v is not None:
                lw[key] = float(np.asarray(v))
        return lw

    w = {
        "sscp0_conv": g("subsample_conv_projection.layer0.conv.weight"),
        "sscp1_conv": g("subsample_conv_projection.layer1.conv.weight"),
        "input_proj": g("subsample_conv_projection.input_proj_linear.weight"),
        "output_proj": g("output_proj.weight", optional=True),
        "output_proj_b": g("output_proj.bias", optional=True),
        "layers": [],
    }
    if w["output_proj"] is not None and w["output_proj_b"] is None:
        w["output_proj_b"] = jnp.zeros(w["output_proj"].shape[0], dtype)
    for i in range(cfg.conf_num_hidden_layers):
        p = f"layers.{i}."
        lw = {
            "pre_attn_norm": g(p + "norm_pre_attn.weight"),
            "post_attn_norm": g(p + "norm_post_attn.weight"),
            "q": clip_lw(p + "self_attn.q_proj"),
            "k": clip_lw(p + "self_attn.k_proj"),
            "v": clip_lw(p + "self_attn.v_proj"),
            "post": clip_lw(p + "self_attn.post"),
            "per_dim_scale": g(p + "self_attn.per_dim_scale"),
            "pos_proj": g(p + "self_attn.relative_k_proj.weight"),
            "norm_out": g(p + "norm_out.weight"),
            "lconv_pre_ln": g(p + "lconv1d.pre_layer_norm.weight"),
            "lconv_start": clip_lw(p + "lconv1d.linear_start"),
            "lconv_depthwise": g(p + "lconv1d.depthwise_conv1d.weight"),
            "lconv_norm": g(p + "lconv1d.conv_norm.weight"),
            "lconv_end": clip_lw(p + "lconv1d.linear_end"),
        }
        for tag, name in (("ffw1", "feed_forward1"), ("ffw2", "feed_forward2")):
            lw[tag] = {
                "pre_ln": g(p + name + ".pre_layer_norm.weight"),
                "w1": clip_lw(p + name + ".ffw_layer_1"),
                "w2": clip_lw(p + name + ".ffw_layer_2"),
                "post_ln": g(p + name + ".post_layer_norm.weight"),
            }
        w["layers"].append(lw)
    return w
