"""Idefics2 — the analog of the reference's
`mistralrs-core/src/vision_models/idefics2/`: SigLIP-style tower (shared
with idefics3, incl. the bucketized fractional position ids), a gated-silu
modality projection, and a PERCEIVER RESAMPLER (fixed latent queries
cross-attending [context; latents] with GQA) that compresses each image to
`resampler_n_latents` tokens merged into a mistral text decoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from ..vision.clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class Idefics2Config:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int
    n_latents: int
    resampler_depth: int
    resampler_heads: int
    resampler_head_dim: int
    resampler_kv_heads: int
    rms_norm_eps: float = 1e-6

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Idefics2Config":
        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["MistralForCausalLM"]})
        pc = d.get("perceiver_config", {})
        return cls(
            text=text,
            vision=VisionConfig.from_hf(d["vision_config"], family="siglip"),
            image_token_id=d.get("image_token_id", 32001),
            n_latents=pc.get("resampler_n_latents", 64),
            resampler_depth=pc.get("resampler_depth", 3),
            resampler_heads=pc.get("resampler_n_heads", 16),
            resampler_head_dim=pc.get("resampler_head_dim", 96),
            resampler_kv_heads=pc.get("num_key_value_heads", 4),
            rms_norm_eps=pc.get("rms_norm_eps", 1e-6),
        )


def idefics2_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Idefics2Config, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    text_sd = {}
    for k, v in sd.items():
        if k.startswith("model.text_model."):
            text_sd["model." + k[len("model.text_model."):]] = v
        elif k == "lm_head.weight":
            text_sd[k] = v
    # vision_weights_from_hf appends "vision_model." itself
    vision = vision_weights_from_hf(sd, "model.", cfg.vision, dtype=jnp.float32)
    c = "model.connector."
    g = lambda k: jnp.asarray(sd[c + k], jnp.float32)  # noqa: E731
    layers = []
    for i in range(cfg.resampler_depth):
        p = f"perceiver_resampler.layers.{i}."
        layers.append({
            "ln_lat": g(p + "input_latents_norm.weight"),
            "ln_ctx": g(p + "input_context_norm.weight"),
            "wq": g(p + "self_attn.q_proj.weight"),
            "wk": g(p + "self_attn.k_proj.weight"),
            "wv": g(p + "self_attn.v_proj.weight"),
            "wo": g(p + "self_attn.o_proj.weight"),
            "ffn_norm": g(p + "post_attention_layernorm.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
        })
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": vision,
        "proj_gate": g("modality_projection.gate_proj.weight"),
        "proj_up": g("modality_projection.up_proj.weight"),
        "proj_down": g("modality_projection.down_proj.weight"),
        "latents": g("perceiver_resampler.latents"),
        "resampler_norm": g("perceiver_resampler.norm.weight"),
        "resampler_layers": layers,
    }


def perceiver_resample(weights: dict, cfg: Idefics2Config, ctx: jax.Array):
    """[B, S, H] image context → [B, n_latents, H] compressed tokens."""
    b = ctx.shape[0]
    eps = cfg.rms_norm_eps
    lat = jnp.broadcast_to(
        weights["latents"], (b, cfg.n_latents, weights["latents"].shape[-1])
    )
    nh, nkv, hd = cfg.resampler_heads, cfg.resampler_kv_heads, cfg.resampler_head_dim
    for lw in weights["resampler_layers"]:
        ql = rms_norm(lat, lw["ln_lat"], eps)
        kc = rms_norm(ctx, lw["ln_ctx"], eps)
        hidden = jnp.concatenate([kc, ql], axis=1)  # [B, S+n, H]
        t_kv = hidden.shape[1]
        q = (ql @ lw["wq"].T).reshape(b, cfg.n_latents, nh, hd)
        k = (hidden @ lw["wk"].T).reshape(b, t_kv, nkv, hd)
        v = (hidden @ lw["wv"].T).reshape(b, t_kv, nkv, hd)
        qf = q.reshape(b, cfg.n_latents, nkv, nh // nkv, hd).astype(jnp.float32)
        s = jnp.einsum("btkgh,bskh->bkgts", qf, k.astype(jnp.float32))
        s = s / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bkgts,bskh->btkgh", p, v.astype(jnp.float32))
        attn = attn.reshape(b, cfg.n_latents, nh * hd).astype(lat.dtype)
        lat = lat + attn @ lw["wo"].T
        x = rms_norm(lat, lw["ffn_norm"], eps)
        lat = lat + (
            jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)
        ) @ lw["down"].T
    return rms_norm(lat, weights["resampler_norm"], eps)


def encode_images(
    weights: dict, cfg: Idefics2Config, pixel_values: jax.Array,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """[N, 3, H, W] → [N, n_latents, H_text] resampled image tokens."""
    from .idefics3 import _bucketed_position_ids

    # idefics2 shares idefics3's fractional-bucketized patch positions
    n_side = cfg.vision.image_size // cfg.vision.patch_size
    wv = dict(weights["vision"])
    wv["pos_embed"] = weights["vision"]["pos_embed"][
        _bucketed_position_ids(n_side)
    ]
    feats = vision_tower_forward(
        wv, cfg.vision, pixel_values,
        feature_layer=-1, compute_dtype=compute_dtype,
    )
    proj = (
        jax.nn.silu(feats @ weights["proj_gate"].T)
        * (feats @ weights["proj_up"].T)
    ) @ weights["proj_down"].T
    return perceiver_resample(weights, cfg, proj)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Idefics2Config,
    prompt_ids: list[int],
    pixel_values,
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving."""
    from ..multimodal import prepare_vlm_prompt

    return prepare_vlm_prompt(
        prompt_ids, pixel_values,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=lambda pv: encode_images(
            weights, cfg, jnp.asarray(pv), compute_dtype=compute_dtype
        ),
        encoder_cache=encoder_cache,
        cache_namespace="idefics2",
        compute_dtype=compute_dtype,
    )
