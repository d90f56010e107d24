"""Phi-4-multimodal audio: NeMo-subsampled conformer encoder + speech
projection — the analog of the reference's conformer crate-in-core
(`mistralrs-core/src/vision_models/conformer/{encoder,nemo,pos_embed}.rs`,
1205 LoC) and the phi4 audio embedding (`vision_models/phi4/mod.rs:448`).

Clean-room JAX against the HF `Phi4MultimodalAudioModel` semantics
(parity-tested): mean/variance input norm → NeMo conv subsampling
(stride-2 conv stack, ×time_reduction) → conformer blocks (macaron ½-FFNs,
MHA with T5-style clipped relative-position bias, GLU pointwise conv +
depthwise-separable conv module) → gelu-gated two-layer speech projection.
Long inputs unfold into 500-frame windows (absolute-position ceiling), and
``chunk_size > 0`` builds the streaming chunk mask. Faithful quirk: HF adds
the BOOLEAN availability mask arithmetically to the attention logits (a
+1 bias on visible positions, not −inf) — reproduced for parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Phi4MMAudioConfig:
    input_size: int = 80
    hidden_size: int = 1024
    num_heads: int = 16
    intermediate_size: int = 1536
    num_blocks: int = 24
    kernel_size: int = 3
    ext_pw_out_channel: int = 1024
    depthwise_separable_out_channel: int = 1024
    depthwise_multiplier: int = 1
    time_reduction: int = 8
    nemo_conv_channels: int = 1024
    nemo_final_size: int = 10
    bias_max_distance: int = 1000
    bias_symmetric: bool = False
    chunk_size: int = -1
    left_chunk: int = 18
    downsample_rate: int = 1
    audio_token_id: int = 200011
    max_abs_positions: int = 500  # unfold window (HF max_seq_len)

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Phi4MMAudioConfig":
        return cls(
            input_size=d.get("input_size", 80),
            hidden_size=d.get("hidden_size", 1024),
            num_heads=d.get("num_attention_heads", 16),
            intermediate_size=d.get("intermediate_size", 1536),
            num_blocks=d.get("num_blocks", 24),
            kernel_size=d.get("kernel_size", 3),
            ext_pw_out_channel=d.get("ext_pw_out_channel", 1024),
            depthwise_separable_out_channel=d.get(
                "depthwise_separable_out_channel", 1024),
            depthwise_multiplier=d.get("depthwise_multiplier", 1),
            time_reduction=d.get("time_reduction", 8),
            nemo_conv_channels=d.get("nemo_conv_channels", 1024),
            nemo_final_size=d.get("nemo_final_size", 10),
            bias_max_distance=d.get("bias_max_distance", 1000),
            bias_symmetric=d.get("bias_symmetric", False),
            chunk_size=d.get("chunk_size", -1),
            left_chunk=d.get("left_chunk", 18),
            downsample_rate=d.get("downsample_rate", 1),
            audio_token_id=d.get("audio_token_id", 200011),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def phi4mm_audio_params(
    sd: Mapping[str, np.ndarray], cfg: Phi4MMAudioConfig,
    dtype=jnp.float32, prefix: str = "",
) -> dict:
    """HF `Phi4MultimodalAudioModel` state dict (optionally under
    ``prefix``, e.g. "model.audio_embed.encoder.") → params pytree."""

    def g(name):
        return jnp.asarray(np.asarray(sd[prefix + name], np.float32), dtype)

    p: dict[str, Any] = {
        "mean": g("encoder_embedding.global_mean"),
        "invstd": g("encoder_embedding.global_invstd"),
        "bias_values": g("relative_attention_bias_layer.bias_values.weight"),
        "out_w": g("embed.out.weight"),
        "out_b": g("embed.out.bias"),
    }
    # NeMo conv stack: layers 0, then pairs (depthwise, pointwise) — HF
    # stores them in one nn.Sequential with activations interleaved; the
    # conv indices are 0, 2, 3, 5, 6, ...
    convs = []
    idx = 0
    convs.append((g(f"embed.conv.{idx}.weight"), g(f"embed.conv.{idx}.bias"),
                  "full"))
    idx += 2
    for _ in range(int(math.log2(cfg.time_reduction)) - 1):
        convs.append((g(f"embed.conv.{idx}.weight"),
                      g(f"embed.conv.{idx}.bias"), "depthwise"))
        convs.append((g(f"embed.conv.{idx + 1}.weight"),
                      g(f"embed.conv.{idx + 1}.bias"), "pointwise"))
        idx += 3
    p["nemo_convs"] = convs

    blocks = []
    for i in range(cfg.num_blocks):
        b = f"encoders.{i}."

        def mlp(which):
            return {
                "ln_w": g(b + which + ".layer_norm.weight"),
                "ln_b": g(b + which + ".layer_norm.bias"),
                "gate_up_w": g(b + which + ".gate_up_proj.weight"),
                "gate_up_b": g(b + which + ".gate_up_proj.bias"),
                "down_w": g(b + which + ".down_proj.weight"),
                "down_b": g(b + which + ".down_proj.bias"),
            }

        blocks.append({
            "ff_in": mlp("feed_forward_in"),
            "ff_out": mlp("feed_forward_out"),
            "ln_att_w": g(b + "layer_norm_att.weight"),
            "ln_att_b": g(b + "layer_norm_att.bias"),
            "ln_w": g(b + "layer_norm.weight"),
            "ln_b": g(b + "layer_norm.bias"),
            "wq": g(b + "self_attn.q_proj.weight"),
            "bq": g(b + "self_attn.q_proj.bias"),
            "wk": g(b + "self_attn.k_proj.weight"),
            "bk": g(b + "self_attn.k_proj.bias"),
            "wv": g(b + "self_attn.v_proj.weight"),
            "bv": g(b + "self_attn.v_proj.bias"),
            "wo": g(b + "self_attn.o_proj.weight"),
            "bo": g(b + "self_attn.o_proj.bias"),
            "conv_ln_w": g(b + "conv.layer_norm.weight"),
            "conv_ln_b": g(b + "conv.layer_norm.bias"),
            "glu_w": g(b + "conv.glu.ext_pw_conv_1d.weight"),
            "glu_b": g(b + "conv.glu.ext_pw_conv_1d.bias"),
            "glu_b1": g(b + "conv.glu.b1"),
            "glu_b2": g(b + "conv.glu.b2"),
            "dw_w": g(b + "conv.dw_sep_conv_1d.dw_conv.weight"),
            "dw_b": g(b + "conv.dw_sep_conv_1d.dw_conv.bias"),
            "pw_w": g(b + "conv.dw_sep_conv_1d.pw_conv.weight"),
            "pw_b": g(b + "conv.dw_sep_conv_1d.pw_conv.bias"),
            "ext_pw_w": g(b + "conv.ext_pw_conv_1d.weight"),
            "ext_pw_b": g(b + "conv.ext_pw_conv_1d.bias"),
        })
    p["blocks"] = blocks
    return p


def phi4mm_audio_projection_params(
    sd: Mapping[str, np.ndarray], dtype=jnp.float32,
    prefix: str = "model.audio_embed.",
) -> dict:
    """The gelu-gated speech projections (`Phi4MultimodalAudioEmbedding`
    up/down_proj pairs for both projection modes)."""

    def g(name):
        return jnp.asarray(np.asarray(sd[prefix + name], np.float32), dtype)

    out = {}
    for mode in ("speech", "vision_speech"):
        out[mode] = {
            "up_w": g(f"up_proj_for_{mode}.weight"),
            "up_b": g(f"up_proj_for_{mode}.bias"),
            "down_w": g(f"down_proj_for_{mode}.weight"),
            "down_b": g(f"down_proj_for_{mode}.bias"),
        }
    return out


def _ln(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b


def _conv2d(x, w, b, stride, groups=1, padding=1):
    # x [B, C, H, W]; w [O, C/g, kh, kw]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    return out + b[None, :, None, None]


def _nemo_subsample(p, cfg, x):
    """[B, T, F] → [B, ⌈T/tr⌉, hidden] (NemoConvSubsampling)."""
    h = x[:, None]  # [B, 1, T, F]
    for w, b, kind in p["nemo_convs"]:
        if kind == "full":
            h = jax.nn.relu(_conv2d(h, w, b, 2))
        elif kind == "depthwise":
            h = _conv2d(h, w, b, 2, groups=h.shape[1])
        else:  # pointwise 1×1 then the activation
            h = jax.nn.relu(_conv2d(h, w, b, 1, padding=0))
    bsz, c, t, f = h.shape
    flat = h.transpose(0, 2, 1, 3).reshape(bsz, t, c * f)
    return flat @ p["out_w"].T + p["out_b"]


def _relative_bias(p, cfg, t):
    ctx = np.arange(t)[:, None]
    mem = np.arange(t)[None, :]
    rel = np.clip(mem - ctx, -cfg.bias_max_distance, cfg.bias_max_distance - 1)
    num_buckets = cfg.bias_max_distance * (1 if cfg.bias_symmetric else 2)
    idx = np.abs(rel) if cfg.bias_symmetric else rel + num_buckets // 2
    bias = p["bias_values"][jnp.asarray(idx)]  # [T, T, H]
    return bias.transpose(2, 0, 1)[None]  # [1, H, T, T]


def _streaming_mask(cfg, t):
    """[T, T] float availability matrix (adaptive_enc_mask; full attention
    when chunk_size ≤ 0). HF ADDS this to the logits (the faithful quirk)."""
    if cfg.chunk_size <= 0:
        return np.ones((t, t), np.float32)
    starts = np.arange(0, t, cfg.chunk_size)
    chunk_of = np.searchsorted(starts, np.arange(t), side="right") - 1
    left = np.maximum(chunk_of - cfg.left_chunk, 0)
    boundary_left = starts[left]
    ends = np.append(starts[1:], t)
    boundary_right = ends[chunk_of]
    cols = np.arange(t)[None, :]
    return ((cols >= boundary_left[:, None])
            & (cols < boundary_right[:, None])).astype(np.float32)


def _mlp(m, x):
    h = _ln(x, m["ln_w"], m["ln_b"])
    gu = h @ m["gate_up_w"].T + m["gate_up_b"]
    up, gate = jnp.split(gu, 2, axis=-1)
    return (up * jax.nn.swish(gate)) @ m["down_w"].T + m["down_b"]


def _attention(b, cfg, x, add_mask):
    bsz, t, _ = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    q = (x @ b["wq"].T + b["bq"]).reshape(bsz, t, nh, hd).transpose(0, 2, 1, 3)
    k = (x @ b["wk"].T + b["bk"]).reshape(bsz, t, nh, hd).transpose(0, 2, 1, 3)
    v = (x @ b["wv"].T + b["bv"]).reshape(bsz, t, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5) + add_mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(bsz, t, nh * hd)
    return out @ b["wo"].T + b["bo"]


def _conv_module(b, cfg, x):
    h = _ln(x, b["conv_ln_w"], b["conv_ln_b"])
    # GLU pointwise conv (1×1 conv ≡ matmul), learned b1/b2 offsets
    hc = h @ b["glu_w"][:, :, 0].T + b["glu_b"]  # [B, T, 2*ext_pw]
    n = cfg.ext_pw_out_channel
    hc = (hc[..., :n] + b["glu_b1"][0, :, 0]) * jax.nn.swish(
        hc[..., n:] + b["glu_b2"][0, :, 0]
    )
    # depthwise separable conv with (k-1)-pad on BOTH sides, then a right
    # trim — HF's quasi-causal formulation
    k = cfg.kernel_size
    hh = hc.transpose(0, 2, 1)  # [B, C, T]
    dw = jax.lax.conv_general_dilated(
        hh, b["dw_w"], window_strides=(1,), padding=[(k - 1, k - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=hh.shape[1],
    ) + b["dw_b"][None, :, None]
    pw = jax.lax.conv_general_dilated(
        dw, b["pw_w"], window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + b["pw_b"][None, :, None]
    if k > 1:
        pw = pw[:, :, : -(k - 1)]
    act = jax.nn.swish(pw)
    out = jax.lax.conv_general_dilated(
        act, b["ext_pw_w"], window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + b["ext_pw_b"][None, :, None]
    return out.transpose(0, 2, 1)


def _encoder_layer(b, cfg, x, add_mask):
    residual = x + 0.5 * _mlp(b["ff_in"], x)
    h = _ln(residual, b["ln_att_w"], b["ln_att_b"])
    h = residual + _attention(b, cfg, h, add_mask)
    h = h + _conv_module(b, cfg, h)
    h = h + 0.5 * _mlp(b["ff_out"], h)
    return _ln(h, b["ln_w"], b["ln_b"])


def conformer_encode(
    p: dict, cfg: Phi4MMAudioConfig, features,  # [B, T, input_size]
) -> jax.Array:
    """Mel features → conformer states [B, ⌈T/tr⌉, hidden] (the HF
    `Phi4MultimodalAudioModel.forward`, single-segment mask-free serving)."""
    x = (jnp.asarray(features) - p["mean"]) * p["invstd"]
    h = _nemo_subsample(p, cfg, x)
    bsz, t, d = h.shape
    win = cfg.max_abs_positions
    unfolded = t > win
    pad = 0
    if unfolded:  # 500-frame windows (absolute-position ceiling)
        pad = (-t) % win
        if pad:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        h = h.reshape(bsz * ((t + pad) // win), win, d)
    tt = h.shape[1]
    add_mask = jnp.asarray(_streaming_mask(cfg, tt))[None, None] \
        + _relative_bias(p, cfg, tt)
    for b in p["blocks"]:
        h = _encoder_layer(b, cfg, h, add_mask)
    if unfolded:
        h = h.reshape(bsz, -1, d)
        if pad:
            h = h[:, :-pad]
    return h


def audio_project(proj: dict, states, mode: str = "speech"):
    """Conformer states → text-embedding rows (gelu-gated projection pair,
    `Phi4MultimodalAudioEmbedding`)."""
    m = proj[mode]
    h = states @ m["up_w"].T + m["up_b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ m["down_w"].T + m["down_b"]


def phi4mm_audio_embed_sizes(cfg: Phi4MMAudioConfig, n_mel_frames: int) -> int:
    """Number of audio placeholder tokens for a mel segment (HF feature
    extractor's `audio_embed_sizes`: ceil over the conv stack)."""
    t = n_mel_frames
    for _ in range(int(math.log2(cfg.time_reduction))):
        t = (t + 1) // 2  # stride-2, pad-1, k=3 conv length
    return t


def phi4mm_logmel(
    wave: np.ndarray,  # [T] float32 mono 16 kHz
    *,
    n_mels: int = 80,
    hop: int = 160,
    win: int = 400,
    n_fft: int = 512,
    preemphasis: float = 0.97,
    mel_max_frequency: float = 7690.0,
) -> np.ndarray:
    """→ [n_frames, n_mels] log-mel features (the HF
    `Phi4MultimodalFeatureExtractor` recipe: hamming-windowed 400/160
    framing, pre-emphasis ×32768, kaldi-scale triangular mel bank to
    7690 Hz, ln(clamp(power·mel, 1))). Parity-tested against HF."""
    from transformers.audio_utils import mel_filter_bank

    x = np.asarray(wave, np.float64)
    if len(x) < win:
        x = np.pad(x, (0, win - len(x)))
    n_frames = 1 + (len(x) - win) // hop
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]
    prev = np.roll(frames, 1, axis=-1)
    prev[:, 0] = prev[:, 1]
    frames = (frames - preemphasis * prev) * 32768.0
    window = np.hamming(win)
    spec = np.fft.rfft(window * frames, n=n_fft, axis=-1)
    power = np.abs(spec) ** 2
    filters = mel_filter_bank(
        num_frequency_bins=n_fft // 2 + 1, num_mel_filters=n_mels,
        min_frequency=0.0, max_frequency=mel_max_frequency,
        sampling_rate=16000, triangularize_in_mel_space=True,
        mel_scale="kaldi",
    )
    logmel = np.log(np.maximum(power @ filters, 1.0))
    return logmel.astype(np.float32)
