"""Qwen2.5-Omni thinker audio encoder — the analog of the reference's
`mistralrs-core/src/vision_models/qwen2_5_omni/` audio tower: the mel is
cut into n_window·2-frame chunks, each chunk runs the whisper-style conv
stack independently (gelu conv1 → masked → stride-2 gelu conv2) with the
sinusoidal positions RESTARTING per chunk, attention is block-diagonal per
chunk, then a stride-2 average pool + layernorm + projection produce one
audio token per 4 mel frames.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Qwen25OmniAudioConfig:
    num_mel_bins: int
    d_model: int
    encoder_layers: int
    encoder_attention_heads: int
    encoder_ffn_dim: int
    n_window: int
    output_dim: int
    max_source_positions: int
    activation: str = "gelu"

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen25OmniAudioConfig":
        return cls(
            num_mel_bins=d.get("num_mel_bins", 128),
            d_model=d.get("d_model", 1280),
            encoder_layers=d.get("encoder_layers", 32),
            encoder_attention_heads=d.get("encoder_attention_heads", 20),
            encoder_ffn_dim=d.get("encoder_ffn_dim", 5120),
            n_window=d.get("n_window", 100),
            output_dim=d.get("output_dim", 3584),
            max_source_positions=d.get("max_source_positions", 1500),
            activation=d.get("activation_function", "gelu"),
        )

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads


def qwen25omni_audio_params(
    sd: Mapping[str, np.ndarray], cfg: Qwen25OmniAudioConfig,
    prefix: str = "audio_tower.", dtype=jnp.float32,
) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(sd[prefix + name], np.float32), dtype)

    layers = []
    for i in range(cfg.encoder_layers):
        layers.append({
            "ln1_w": g(f"layers.{i}.self_attn_layer_norm.weight"),
            "ln1_b": g(f"layers.{i}.self_attn_layer_norm.bias"),
            "wq": g(f"layers.{i}.self_attn.q_proj.weight"),
            "wq_b": g(f"layers.{i}.self_attn.q_proj.bias"),
            "wk": g(f"layers.{i}.self_attn.k_proj.weight"),
            "wv": g(f"layers.{i}.self_attn.v_proj.weight"),
            "wv_b": g(f"layers.{i}.self_attn.v_proj.bias"),
            "wo": g(f"layers.{i}.self_attn.out_proj.weight"),
            "wo_b": g(f"layers.{i}.self_attn.out_proj.bias"),
            "ln2_w": g(f"layers.{i}.final_layer_norm.weight"),
            "ln2_b": g(f"layers.{i}.final_layer_norm.bias"),
            "fc1": g(f"layers.{i}.fc1.weight"),
            "fc1_b": g(f"layers.{i}.fc1.bias"),
            "fc2": g(f"layers.{i}.fc2.weight"),
            "fc2_b": g(f"layers.{i}.fc2.bias"),
        })
    return {
        "conv1": g("conv1.weight"), "conv1_b": g("conv1.bias"),
        "conv2": g("conv2.weight"), "conv2_b": g("conv2.bias"),
        "ln_post_w": g("ln_post.weight"), "ln_post_b": g("ln_post.bias"),
        "proj": g("proj.weight"), "proj_b": g("proj.bias"),
        "layers": layers,
    }


def _ln(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b


def _sinusoids(length: int, channels: int) -> np.ndarray:
    inc = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _conv1d(x, w, b, stride):
    """x [C_in, T] (zero-pad 1 both sides), w [C_out, C_in, K] → [C_out, T']."""
    y = jax.lax.conv_general_dilated(
        x[None], w.astype(x.dtype), window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]
    return y + b[:, None]


def qwen25omni_audio_encode(
    weights: dict, cfg: Qwen25OmniAudioConfig, mel: jax.Array,  # [F, T]
) -> jax.Array:
    """One audio: [F, T] mel → [ceil(T/2)//2, output_dim] audio tokens."""
    n2 = cfg.n_window * 2
    t_total = mel.shape[1]
    states = []
    lens_after = []
    for s in range(0, t_total, n2):
        chunk = mel[:, s : s + n2]
        clen = chunk.shape[1]
        pad = n2 - clen
        if pad:
            chunk = jnp.pad(chunk, ((0, 0), (0, pad)))
        mask = (np.arange(n2) < clen).astype(np.float32)
        x = jax.nn.gelu(
            _conv1d(chunk, weights["conv1"], weights["conv1_b"], 1),
            approximate=False,
        ) * mask[None]
        x = jax.nn.gelu(
            _conv1d(x, weights["conv2"], weights["conv2_b"], 2),
            approximate=False,
        ).T  # [n_window, D]
        valid = (clen - 1) // 2 + 1
        x = x + jnp.asarray(_sinusoids(x.shape[0], cfg.d_model), x.dtype)
        states.append(x[:valid])
        lens_after.append(valid)
    h = jnp.concatenate(states, axis=0)  # [T', D]
    chunk_id = np.repeat(np.arange(len(lens_after)), lens_after)
    same_chunk = jnp.asarray(chunk_id[:, None] == chunk_id[None, :])

    nh, hd = cfg.encoder_attention_heads, cfg.head_dim
    scale = hd ** -0.5
    n = h.shape[0]
    for lw in weights["layers"]:
        x = _ln(h, lw["ln1_w"], lw["ln1_b"])
        q = (x @ lw["wq"].T + lw["wq_b"]).reshape(n, nh, hd)
        k = (x @ lw["wk"].T).reshape(n, nh, hd)  # whisper: k has no bias
        v = (x @ lw["wv"].T + lw["wv_b"]).reshape(n, nh, hd)
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        logits = jnp.where(same_chunk[None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, nh * hd)
        h = h + attn @ lw["wo"].T + lw["wo_b"]
        x = _ln(h, lw["ln2_w"], lw["ln2_b"])
        ff = jax.nn.gelu(x @ lw["fc1"].T + lw["fc1_b"], approximate=False)
        h = h + ff @ lw["fc2"].T + lw["fc2_b"]

    # stride-2 average pool over the WHOLE audio (odd tail dropped)
    t2 = (h.shape[0] // 2) * 2
    h = h[:t2].reshape(-1, 2, cfg.d_model).mean(axis=1)
    h = _ln(h, weights["ln_post_w"], weights["ln_post_b"])
    return h @ weights["proj"].T + weights["proj_b"]


# ---------------------------------------------------------------------------
# Qwen3-Omni variant: 3x stride-2 conv2d downsampling (freq AND time, /8),
# per-chunk restarting sinusoid positions, n_window_infer-grouped block
# attention, ln_post + 2-layer gelu projection.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Qwen3OmniAudioConfig:
    num_mel_bins: int
    d_model: int
    encoder_layers: int
    encoder_attention_heads: int
    encoder_ffn_dim: int
    n_window: int
    n_window_infer: int
    downsample_hidden_size: int
    output_dim: int
    max_source_positions: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen3OmniAudioConfig":
        return cls(
            num_mel_bins=d.get("num_mel_bins", 128),
            d_model=d.get("d_model", 1280),
            encoder_layers=d.get("encoder_layers", 32),
            encoder_attention_heads=d.get("encoder_attention_heads", 20),
            encoder_ffn_dim=d.get("encoder_ffn_dim", 5120),
            n_window=d.get("n_window", 100),
            n_window_infer=d.get("n_window_infer", 400),
            downsample_hidden_size=d.get("downsample_hidden_size", 480),
            output_dim=d.get("output_dim", 3584),
            max_source_positions=d.get("max_source_positions", 1500),
        )

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads


def aftercnn_length(t: int) -> int:
    """HF `_get_feat_extract_output_lengths`: /8 ceil per ≤100-frame chunk
    (the >100 part hardcodes the production n_window=100 chunking)."""
    leave = t % 100
    feat = (leave - 1) // 2 + 1
    return ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (t // 100) * 13


def qwen3omni_audio_params(
    sd: Mapping[str, np.ndarray], cfg: Qwen3OmniAudioConfig,
    prefix: str = "audio_tower.", dtype=jnp.float32,
) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(sd[prefix + name], np.float32), dtype)

    layers = []
    for i in range(cfg.encoder_layers):
        layers.append({
            "ln1_w": g(f"layers.{i}.self_attn_layer_norm.weight"),
            "ln1_b": g(f"layers.{i}.self_attn_layer_norm.bias"),
            "wq": g(f"layers.{i}.self_attn.q_proj.weight"),
            "wq_b": g(f"layers.{i}.self_attn.q_proj.bias"),
            "wk": g(f"layers.{i}.self_attn.k_proj.weight"),
            "wk_b": g(f"layers.{i}.self_attn.k_proj.bias"),
            "wv": g(f"layers.{i}.self_attn.v_proj.weight"),
            "wv_b": g(f"layers.{i}.self_attn.v_proj.bias"),
            "wo": g(f"layers.{i}.self_attn.out_proj.weight"),
            "wo_b": g(f"layers.{i}.self_attn.out_proj.bias"),
            "ln2_w": g(f"layers.{i}.final_layer_norm.weight"),
            "ln2_b": g(f"layers.{i}.final_layer_norm.bias"),
            "fc1": g(f"layers.{i}.fc1.weight"),
            "fc1_b": g(f"layers.{i}.fc1.bias"),
            "fc2": g(f"layers.{i}.fc2.weight"),
            "fc2_b": g(f"layers.{i}.fc2.bias"),
        })
    return {
        "conv1": g("conv2d1.weight"), "conv1_b": g("conv2d1.bias"),
        "conv2": g("conv2d2.weight"), "conv2_b": g("conv2d2.bias"),
        "conv3": g("conv2d3.weight"), "conv3_b": g("conv2d3.bias"),
        "conv_out": g("conv_out.weight"),  # bias-free linear
        "conv_out_b": (
            g("conv_out.bias")
            if prefix + "conv_out.bias" in sd else jnp.zeros(
                (cfg.d_model,), dtype
            )
        ),
        "ln_post_w": g("ln_post.weight"), "ln_post_b": g("ln_post.bias"),
        "proj1": g("proj1.weight"), "proj1_b": g("proj1.bias"),
        "proj2": g("proj2.weight"), "proj2_b": g("proj2.bias"),
        "layers": layers,
    }


def _conv2d_s2(x, w, b):
    """[B, C, F, T] stride-2 3x3 conv with padding 1, gelu."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + b[None, :, None, None]
    return jax.nn.gelu(y, approximate=False)


def qwen3omni_audio_encode(
    weights: dict, cfg: Qwen3OmniAudioConfig, mel: jax.Array,  # [F, T]
) -> jax.Array:
    """One audio: [F, T] mel → [aftercnn_length(T), output_dim] tokens."""
    n2 = cfg.n_window * 2
    t_total = mel.shape[1]
    chunk_lens = [min(n2, t_total - s) for s in range(0, t_total, n2)]
    max_len = max(chunk_lens)
    chunks = []
    for i, s in enumerate(range(0, t_total, n2)):
        c = mel[:, s : s + chunk_lens[i]]
        if c.shape[1] < max_len:
            c = jnp.pad(c, ((0, 0), (0, max_len - c.shape[1])))
        chunks.append(c)
    x = jnp.stack(chunks)[:, None]  # [chunks, 1, F, max_len]
    x = _conv2d_s2(x, weights["conv1"], weights["conv1_b"])
    x = _conv2d_s2(x, weights["conv2"], weights["conv2_b"])
    x = _conv2d_s2(x, weights["conv3"], weights["conv3_b"])
    bb, c, f, tt = x.shape
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(bb, tt, c * f)
    x = x @ weights["conv_out"].T + weights["conv_out_b"]
    x = x + jnp.asarray(_sinusoids(tt, cfg.d_model), x.dtype)[None]
    valid = [aftercnn_length(cl) for cl in chunk_lens]
    h = jnp.concatenate([x[i, :v] for i, v in enumerate(valid)], axis=0)

    # attention windows: groups of window_aftercnn tokens over the audio
    window = tt * (cfg.n_window_infer // n2)
    total = sum(valid)
    win_id = np.arange(total) // max(window, 1)
    same_win = jnp.asarray(win_id[:, None] == win_id[None, :])

    nh, hd = cfg.encoder_attention_heads, cfg.head_dim
    scale = hd ** -0.5
    n = h.shape[0]
    for lw in weights["layers"]:
        xx = _ln(h, lw["ln1_w"], lw["ln1_b"])
        q = (xx @ lw["wq"].T + lw["wq_b"]).reshape(n, nh, hd)
        k = (xx @ lw["wk"].T + lw["wk_b"]).reshape(n, nh, hd)
        v = (xx @ lw["wv"].T + lw["wv_b"]).reshape(n, nh, hd)
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        logits = jnp.where(same_win[None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, nh * hd)
        h = h + attn @ lw["wo"].T + lw["wo_b"]
        xx = _ln(h, lw["ln2_w"], lw["ln2_b"])
        ff = jax.nn.gelu(xx @ lw["fc1"].T + lw["fc1_b"], approximate=False)
        h = h + ff @ lw["fc2"].T + lw["fc2_b"]

    h = _ln(h, weights["ln_post_w"], weights["ln_post_b"])
    h = jax.nn.gelu(h @ weights["proj1"].T + weights["proj1_b"],
                    approximate=False)
    return h @ weights["proj2"].T + weights["proj2_b"]
