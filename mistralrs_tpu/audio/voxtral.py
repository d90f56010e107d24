"""Voxtral (Mistral audio understanding) — the analog of the reference's
`mistralrs-core/src/vision_models/voxtral/`: a Whisper-style audio encoder
(2 strided convs + transformer over log-mel frames), 4-frame concat into
the adapter MLP, and audio embeddings merged at `[AUDIO]` placeholder
positions of a mistral/llama text decoder — which serves through the
engine's prompt-embeds path like any VLM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class VoxtralEncoderConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_mel_bins: int
    max_source_positions: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "VoxtralEncoderConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            num_mel_bins=d["num_mel_bins"],
            max_source_positions=d["max_source_positions"],
        )


@dataclass(frozen=True)
class VoxtralConfig:
    text: ModelConfig
    audio: VoxtralEncoderConfig
    audio_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "VoxtralConfig":
        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["LlamaForCausalLM"]})
        return cls(
            text=text,
            audio=VoxtralEncoderConfig.from_hf(d["audio_config"]),
            audio_token_id=d.get("audio_token_id", 24),
        )


def voxtral_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: VoxtralConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from ..models.hf_loader import weights_from_state_dict

    text_sd = {
        k[len("language_model."):]: v
        for k, v in sd.items() if k.startswith("language_model.")
    }
    g = lambda k: jnp.asarray(sd["audio_tower." + k], dtype)  # noqa: E731
    layers = []
    for i in range(cfg.audio.num_layers):
        p = f"layers.{i}."
        layers.append({
            "wq": g(p + "self_attn.q_proj.weight"),
            "wq_b": g(p + "self_attn.q_proj.bias"),
            "wk": g(p + "self_attn.k_proj.weight"),
            "wv": g(p + "self_attn.v_proj.weight"),
            "wv_b": g(p + "self_attn.v_proj.bias"),
            "wo": g(p + "self_attn.out_proj.weight"),
            "wo_b": g(p + "self_attn.out_proj.bias"),
            "ln1": g(p + "self_attn_layer_norm.weight"),
            "ln1_b": g(p + "self_attn_layer_norm.bias"),
            "fc1": g(p + "fc1.weight"),
            "fc1_b": g(p + "fc1.bias"),
            "fc2": g(p + "fc2.weight"),
            "fc2_b": g(p + "fc2.bias"),
            "ln2": g(p + "final_layer_norm.weight"),
            "ln2_b": g(p + "final_layer_norm.bias"),
        })
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "audio": {
            "conv1": g("conv1.weight"),  # [H, mel, 3]
            "conv1_b": g("conv1.bias"),
            "conv2": g("conv2.weight"),  # [H, H, 3]
            "conv2_b": g("conv2.bias"),
            "pos": g("embed_positions.weight"),
            "ln": g("layer_norm.weight"),
            "ln_b": g("layer_norm.bias"),
            "layers": layers,
        },
        "proj_w1": jnp.asarray(sd["multi_modal_projector.linear_1.weight"], dtype),
        "proj_w2": jnp.asarray(sd["multi_modal_projector.linear_2.weight"], dtype),
    }


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _conv1d(x, w, b, stride):
    """x [B, C_in, T], w [C_out, C_in, 3], pad 1 → [B, C_out, T/stride]."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


def voxtral_encoder_forward(
    params: dict, cfg: VoxtralEncoderConfig, mel: jax.Array,  # [B, mel, T]
) -> jax.Array:
    """→ encoder states [B, T/2, H] (Whisper-style, HF parity)."""
    mel = mel.astype(params["conv1"].dtype)
    h = jax.nn.gelu(_conv1d(mel, params["conv1"], params["conv1_b"], 1),
                    approximate=False)
    h = jax.nn.gelu(_conv1d(h, params["conv2"], params["conv2_b"], 2),
                    approximate=False)
    h = h.transpose(0, 2, 1)  # [B, T', H]
    h = h + params["pos"][: h.shape[1]]
    heads = cfg.num_heads
    hd = cfg.hidden_size // heads
    b, t, d = h.shape
    for lw in params["layers"]:
        x = _ln(h, lw["ln1"], lw["ln1_b"])
        q = (x @ lw["wq"].T + lw["wq_b"]).reshape(b, t, heads, hd)
        k = (x @ lw["wk"].T).reshape(b, t, heads, hd)
        v = (x @ lw["wv"].T + lw["wv_b"]).reshape(b, t, heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(h.dtype)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        h = h + (attn @ lw["wo"].T + lw["wo_b"])
        x = _ln(h, lw["ln2"], lw["ln2_b"])
        x = jax.nn.gelu(x @ lw["fc1"].T + lw["fc1_b"], approximate=False)
        h = h + (x @ lw["fc2"].T + lw["fc2_b"])
    return _ln(h, params["ln"], params["ln_b"])


def get_audio_features(
    weights: dict, cfg: VoxtralConfig, mel: jax.Array  # [B, mel, T]
) -> jax.Array:
    """→ audio embeddings [n_audio_tokens, H_text]: encoder frames are
    concatenated in groups (intermediate_size / hidden) then projected."""
    enc = voxtral_encoder_forward(weights["audio"], cfg.audio, mel)
    flat = enc.reshape(-1, cfg.audio.intermediate_size)
    h = jax.nn.gelu(flat @ weights["proj_w1"].T, approximate=False)
    return h @ weights["proj_w2"].T


def prepare_multimodal_prompt(
    weights: dict,
    cfg: VoxtralConfig,
    prompt_ids: list[int],
    mel,  # [B, mel, T] log-mel features or None
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving:
    audio features merged at audio-token placeholder positions."""
    from ..multimodal import prepare_vlm_prompt

    return prepare_vlm_prompt(
        prompt_ids, mel,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.audio_token_id,
        encode=lambda m: get_audio_features(weights, cfg, jnp.asarray(m))[None],
        encoder_cache=encoder_cache,
        cache_namespace="voxtral",
        compute_dtype=compute_dtype,
    )
