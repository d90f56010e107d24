"""Gemma 3n audio encoder (Universal Speech Model conformer) — the analog
of the reference's `mistralrs-core/src/vision_models/gemma3n/audio.rs` /
conformer stack: sub-sample conv projection (reverse-causal 2D convs with
CUMULATIVE group norm), conformer blocks (half-residual FFWs, chunked local
attention with relative position embeddings + per-dim query scales +
logit softcap, causal depthwise light conv), 4x time reduction, and the
multimodal embedder projecting soft tokens into the decoder space.

Single-utterance serving path: the full mel is valid (no padding mask),
which collapses HF's masked branches to the dense math below.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _rms(x, w=None, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if w is not None:
        n = n * w.astype(jnp.float32)
    return n.astype(x.dtype)


@dataclass(frozen=True)
class Gemma3nAudioConfig:
    input_feat_size: int
    hidden_size: int
    conf_num_hidden_layers: int
    conf_num_attention_heads: int
    conf_attention_chunk_size: int
    conf_attention_context_left: int
    conf_attention_context_right: int
    conf_attention_logit_cap: float
    conf_conv_kernel_size: int
    conf_reduction_factor: int
    conf_residual_weight: float
    sscp_conv_channel_size: tuple[int, ...]
    sscp_conv_kernel_size: tuple[tuple[int, int], ...]
    sscp_conv_stride_size: tuple[tuple[int, int], ...]
    sscp_conv_group_norm_eps: float
    gradient_clipping: float
    rms_norm_eps: float
    vocab_size: int
    vocab_offset: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Gemma3nAudioConfig":
        return cls(
            input_feat_size=d.get("input_feat_size", 128),
            hidden_size=d["hidden_size"],
            conf_num_hidden_layers=d.get("conf_num_hidden_layers", 12),
            conf_num_attention_heads=d.get("conf_num_attention_heads", 8),
            conf_attention_chunk_size=d.get("conf_attention_chunk_size", 12),
            conf_attention_context_left=d.get("conf_attention_context_left", 13),
            conf_attention_context_right=d.get("conf_attention_context_right", 0),
            conf_attention_logit_cap=d.get("conf_attention_logit_cap", 50.0),
            conf_conv_kernel_size=d.get("conf_conv_kernel_size", 5),
            conf_reduction_factor=d.get("conf_reduction_factor", 4),
            conf_residual_weight=d.get("conf_residual_weight", 0.5),
            sscp_conv_channel_size=tuple(d.get("sscp_conv_channel_size", (128, 32))),
            sscp_conv_kernel_size=tuple(
                tuple(k) for k in d.get("sscp_conv_kernel_size", ((3, 3), (3, 3)))
            ),
            sscp_conv_stride_size=tuple(
                tuple(s) for s in d.get("sscp_conv_stride_size", ((2, 2), (2, 2)))
            ),
            sscp_conv_group_norm_eps=d.get("sscp_conv_group_norm_eps", 1e-3),
            gradient_clipping=d.get("gradient_clipping", 1e10),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            vocab_size=d.get("vocab_size", 128),
            vocab_offset=d.get("vocab_offset", 262272),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.conf_num_attention_heads


def gemma3n_audio_weights_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: Gemma3nAudioConfig,
    tower_prefix: str = "model.audio_tower.",
    embedder_prefix: str = "model.embed_audio.",
    dtype=jnp.float32,
) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(sd[name], np.float32), dtype)

    t = tower_prefix
    blocks = []
    for i in range(cfg.conf_num_hidden_layers):
        p = f"{t}conformer.{i}."
        blocks.append({
            "ffws_pre": g(p + "ffw_layer_start.pre_layer_norm.weight"),
            "ffws_1": g(p + "ffw_layer_start.ffw_layer_1.weight"),
            "ffws_2": g(p + "ffw_layer_start.ffw_layer_2.weight"),
            "ffws_post": g(p + "ffw_layer_start.post_layer_norm.weight"),
            "attn_pre": g(p + "attention.pre_attn_norm.weight"),
            "wq": g(p + "attention.attn.q_proj.weight"),
            "wk": g(p + "attention.attn.k_proj.weight"),
            "wv": g(p + "attention.attn.v_proj.weight"),
            "pos_proj": g(p + "attention.attn.relative_position_embedding.pos_proj.weight"),
            "per_dim_scale": g(p + "attention.attn.per_dim_scale"),
            "attn_post": g(p + "attention.post.weight"),
            "attn_post_norm": g(p + "attention.post_norm.weight"),
            "lconv_pre": g(p + "lconv1d.pre_layer_norm.weight"),
            "lconv_start": g(p + "lconv1d.linear_start.weight"),
            "lconv_dw": g(p + "lconv1d.depthwise_conv1d.weight"),
            "lconv_norm": g(p + "lconv1d.conv_norm.weight"),
            "lconv_end": g(p + "lconv1d.linear_end.weight"),
            "ffwe_pre": g(p + "ffw_layer_end.pre_layer_norm.weight"),
            "ffwe_1": g(p + "ffw_layer_end.ffw_layer_1.weight"),
            "ffwe_2": g(p + "ffw_layer_end.ffw_layer_2.weight"),
            "ffwe_post": g(p + "ffw_layer_end.post_layer_norm.weight"),
            "norm": g(p + "norm.weight"),
        })
    e = embedder_prefix
    return {
        "conv0": g(t + "subsample_conv_projection.conv_0.conv.weight"),
        "conv0_norm": g(t + "subsample_conv_projection.conv_0.norm.weight"),
        "conv1": g(t + "subsample_conv_projection.conv_1.conv.weight"),
        "conv1_norm": g(t + "subsample_conv_projection.conv_1.norm.weight"),
        "input_proj": g(t + "subsample_conv_projection.input_proj_linear.weight"),
        "blocks": blocks,
        "embed_soft_norm": g(e + "soft_embedding_norm.weight"),
        "embed_proj": g(e + "embedding_projection.weight"),
        "embed_table": g(e + "embedding.weight"),
        "embed_hard_norm": g(e + "hard_embedding_norm.weight"),
    }


def _cumulative_group_norm(x, weight, eps):
    """[B, T, F, C]: normalize each (t) against cumulative mean/var over all
    (t'≤t, F, C) elements (full-valid mask path)."""
    x32 = x.astype(jnp.float32)
    b, tt, f, c = x32.shape
    sums = jnp.cumsum(jnp.sum(x32, axis=(2, 3), keepdims=True), axis=1)
    counts = jnp.arange(1, tt + 1, dtype=jnp.float32)[None, :, None, None] * (f * c)
    mean = sums / counts
    sq = jnp.cumsum(
        jnp.sum((x32 - mean) ** 2, axis=(2, 3), keepdims=True), axis=1
    )
    var = sq / counts
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def _sscp_block(x, wconv, wnorm, stride, eps):
    """[B, C_in, T, F] → reverse-causal 2D conv (pad T right by k-1, F by
    1/1), cumulative group norm, relu."""
    kh, kw = wconv.shape[2], wconv.shape[3]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, kh - 1), (1, 1)))
    y = jax.lax.conv_general_dilated(
        x, wconv.astype(x.dtype), window_strides=stride, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = jnp.transpose(y, (0, 2, 3, 1))  # [B, T, F, C]
    y = _cumulative_group_norm(y, wnorm, eps)
    y = jnp.transpose(y, (0, 3, 1, 2))
    return jax.nn.relu(y)


def _chunk_blocks(x, w):
    """[B, T, ...] → [B, ceil(T/w), w, ...] (zero padded)."""
    b, tt = x.shape[:2]
    u = -(-tt // w)
    pad = u * w - tt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x.reshape((b, u, w) + x.shape[2:])


def _chunk_context(x, w, left, right):
    """[B, T, ...] → [B, ceil(T/w), w+left+right, ...] sliding contexts."""
    b, tt = x.shape[:2]
    u = -(-tt // w)
    ctx = w + left + right
    x = jnp.pad(
        x, ((0, 0), (left, right + u * w - tt + w - 1)) + ((0, 0),) * (x.ndim - 2)
    )
    idx = jnp.arange(u)[:, None] * w + jnp.arange(ctx)[None, :]
    return x[:, idx]  # [B, U, C, ...]


def _conformer_attention(x, lw, cfg: Gemma3nAudioConfig):
    b, tt, d = x.shape
    nh, hd = cfg.conf_num_attention_heads, cfg.head_dim
    w = cfg.conf_attention_chunk_size
    left = max(0, cfg.conf_attention_context_left - 1)
    right = cfg.conf_attention_context_right
    ctx = w + left + right
    span = left + right + 1

    q = (x @ lw["wq"].T).reshape(b, tt, nh, hd)
    k = (x @ lw["wk"].T).reshape(b, tt, nh, hd)
    v = (x @ lw["wv"].T).reshape(b, tt, nh, hd)
    r_softplus_0 = 1.0 / float(np.log(2.0))  # 1/softplus(0)
    scale = (hd ** -0.5) * r_softplus_0
    q = q * scale * jax.nn.softplus(lw["per_dim_scale"]).astype(q.dtype)

    qb = _chunk_blocks(q, w)  # [B, U, W, N, H]
    kb = _chunk_context(k, w, left, right)  # [B, U, C, N, H]
    vb = _chunk_context(v, w, left, right)
    u = qb.shape[1]

    # relative position term (sinusoidal timing signal → pos_proj)
    pos = np.arange(left, -right - 1, -1, dtype=np.float32)  # [span]
    n_ts = d // 2
    log_inc = np.log(1e4) / max(n_ts - 1, 1)
    inv_ts = np.exp(np.arange(n_ts) * -log_inc)
    scaled = pos[:, None] * inv_ts[None]
    timing = np.concatenate([np.sin(scaled), np.cos(scaled)], -1)  # [span, D]
    sin_emb = (jnp.asarray(timing, x.dtype) @ lw["pos_proj"].T).reshape(
        span, nh, hd
    )

    term_ac = jnp.einsum("buwnh,bucnh->bnuwc", qb, kb)
    term_bd = jnp.einsum("buwnh,fnh->bnuwf", qb, sin_emb)
    # relative shift [.., span] → [.., ctx]
    pad = ctx + 1 - span
    term_bd = jnp.pad(term_bd, ((0, 0),) * 4 + ((0, pad),))
    term_bd = term_bd.reshape(b, nh, u, w * (ctx + 1))[..., : w * ctx]
    term_bd = term_bd.reshape(b, nh, u, w, ctx)
    logits = term_ac + term_bd
    cap = cfg.conf_attention_logit_cap
    logits = jnp.tanh(logits / cap) * cap

    # validity: token position inside the padded context must exist, plus
    # the local causal window
    qpos = jnp.arange(u)[:, None] * w + jnp.arange(w)[None, :]  # [U, W]
    kpos = jnp.arange(u)[:, None] * w - left + jnp.arange(ctx)[None, :]  # [U, C]
    valid = (kpos >= 0) & (kpos < tt)  # [U, C]
    causal = (
        (kpos[:, None, :] <= qpos[:, :, None] + right)
        & (kpos[:, None, :] >= qpos[:, :, None] - left)
    )  # [U, W, C]
    mask = valid[:, None, :] & causal
    logits = jnp.where(mask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vb.dtype)
    out = jnp.einsum("bnuwc,bucnh->buwnh", probs, vb)
    return out.reshape(b, u * w, nh * hd)[:, :tt]


def gemma3n_audio_encode(
    weights: dict,
    cfg: Gemma3nAudioConfig,
    mel: jax.Array,  # [B, T, input_feat_size] log-mel frames
) -> jax.Array:
    """→ soft audio tokens [B, T//(4·reduction), hidden] (full-valid mask)."""
    eps = cfg.rms_norm_eps
    clip = cfg.gradient_clipping
    x = mel[:, None]  # [B, 1, T, F]
    x = _sscp_block(x, weights["conv0"], weights["conv0_norm"],
                    cfg.sscp_conv_stride_size[0], cfg.sscp_conv_group_norm_eps)
    x = _sscp_block(x, weights["conv1"], weights["conv1_norm"],
                    cfg.sscp_conv_stride_size[1], cfg.sscp_conv_group_norm_eps)
    b, c, tt, f = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, tt, f * c)
    x = x @ weights["input_proj"].T

    def ffw(x, pre, w1, w2, post):
        r = x
        x = jnp.clip(x, -clip, clip)
        x = _rms(x, pre, eps)
        x = jax.nn.silu(x @ w1.T) @ w2.T
        x = jnp.clip(x, -clip, clip)
        return r + _rms(x, post, eps) * cfg.conf_residual_weight

    for lw in weights["blocks"]:
        x = ffw(x, lw["ffws_pre"], lw["ffws_1"], lw["ffws_2"], lw["ffws_post"])
        r = x
        xa = _rms(jnp.clip(x, -clip, clip), lw["attn_pre"], eps)
        attn = _conformer_attention(xa, lw, cfg)
        attn = jnp.clip(attn @ lw["attn_post"].T, -clip, clip)
        x = r + _rms(attn, lw["attn_post_norm"], eps)
        # light conv (full-valid mask → no zeroing needed)
        r = x
        xc = _rms(x, lw["lconv_pre"], eps)
        xc = xc @ lw["lconv_start"].T
        half = xc.shape[-1] // 2
        xc = xc[..., :half] * jax.nn.sigmoid(xc[..., half:])  # GLU
        kern = lw["lconv_dw"][:, 0, :].T  # [k, D]
        ksz = kern.shape[0]
        xp = jnp.pad(xc, ((0, 0), (ksz - 1, 0), (0, 0)))
        xc = sum(
            xp[:, i : i + xc.shape[1]] * kern[i][None, None] for i in range(ksz)
        )
        xc = jnp.clip(xc, -clip, clip)
        xc = jax.nn.silu(_rms(xc, lw["lconv_norm"], eps))
        x = r + xc @ lw["lconv_end"].T
        x = ffw(x, lw["ffwe_pre"], lw["ffwe_1"], lw["ffwe_2"], lw["ffwe_post"])
        x = _rms(jnp.clip(x, -clip, clip), lw["norm"], eps)

    if cfg.conf_reduction_factor > 1:
        x = x[:, :: cfg.conf_reduction_factor]
    return x


def embed_audio_soft(weights: dict, text_hidden: int, soft: jax.Array, eps=1e-6):
    """Multimodal embedder (soft path): rms-norm → projection → unscaled
    rms-norm into the decoder space."""
    x = _rms(soft, weights["embed_soft_norm"], eps)
    x = x @ weights["embed_proj"].T
    return _rms(x, None, eps)
