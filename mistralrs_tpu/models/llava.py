"""LLaVA-style multimodal model (the analog of the reference's
`mistralrs-core/src/vision_models/llava/`): CLIP vision tower →
2-layer MLP projector → image embeddings merged at <image> placeholder
positions → llama-family text decoder.

Covers `LlavaForConditionalGeneration` checkpoints; the same merge mechanism
serves other tower+projector VLMs as they are added."""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.linear import embedding_lookup
from ..vision.clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .config import ModelConfig, config_from_hf
from .llama import KVCache, forward


@dataclass
class LlavaConfig:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int
    vision_feature_layer: int = -2
    drop_cls_token: bool = True  # "default" select strategy
    projector_act: str = "gelu"

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "LlavaConfig":
        text = config_from_hf(
            d["text_config"] | {"architectures": ["LlamaForCausalLM"]}
        )
        vis = VisionConfig.from_hf(d["vision_config"], family="clip")
        return cls(
            text=text,
            vision=vis,
            image_token_id=d.get("image_token_index", 32000),
            vision_feature_layer=d.get("vision_feature_layer", -2),
            drop_cls_token=d.get("vision_feature_select_strategy", "default")
            == "default",
        )


def llava_weights_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: LlavaConfig,
    *,
    dtype=jnp.bfloat16,
    isq=None,
) -> dict:
    from .hf_loader import weights_from_state_dict

    # text subtree: strip the language_model prefix (new-style HF llava uses
    # "model.language_model." / "lm_head"; old style "language_model.model.")
    text_sd = {}
    for k, v in sd.items():
        for pref, rep in (
            ("language_model.model.", "model."),
            ("language_model.lm_head.", "lm_head."),
            ("model.language_model.", "model."),
        ):
            if k.startswith(pref):
                text_sd[rep + k[len(pref):]] = v
                break
        else:
            if k == "lm_head.weight":
                text_sd[k] = v
    text = weights_from_state_dict(text_sd, cfg.text, dtype=dtype, isq=isq)

    vis_prefix = (
        "vision_tower." if "vision_tower.vision_model.embeddings.class_embedding" in sd
        else "model.vision_tower."
    )
    vision = vision_weights_from_hf(sd, vis_prefix, cfg.vision, dtype=jnp.float32)

    proj_prefix = (
        "multi_modal_projector."
        if "multi_modal_projector.linear_1.weight" in sd
        else "model.multi_modal_projector."
    )
    projector = {
        "w1": jnp.asarray(sd[proj_prefix + "linear_1.weight"], jnp.float32),
        "b1": jnp.asarray(sd[proj_prefix + "linear_1.bias"], jnp.float32),
        "w2": jnp.asarray(sd[proj_prefix + "linear_2.weight"], jnp.float32),
        "b2": jnp.asarray(sd[proj_prefix + "linear_2.bias"], jnp.float32),
    }
    return {"text": text, "vision": vision, "projector": projector}


def encode_images(weights: dict, cfg: LlavaConfig, pixel_values: jax.Array,
                  compute_dtype=jnp.float32) -> jax.Array:
    """pixel_values [N, 3, H, W] → projected image features [N, np, H_text]."""
    feats = vision_tower_forward(
        weights["vision"], cfg.vision, pixel_values,
        feature_layer=cfg.vision_feature_layer, compute_dtype=compute_dtype,
    )
    if cfg.drop_cls_token and cfg.vision.use_class_token:
        feats = feats[:, 1:]
    p = weights["projector"]
    h = feats @ p["w1"].T.astype(feats.dtype) + p["b1"].astype(feats.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["w2"].T.astype(h.dtype) + p["b2"].astype(h.dtype)


def merge_image_embeddings(
    text_embeds: jax.Array,  # [B, T, H]
    input_ids: jax.Array,  # [B, T]
    image_features: jax.Array,  # [N_img, np, H] (images in reading order)
    image_token_id: int,
) -> jax.Array:
    """Replace <image> placeholder positions with image feature rows."""
    b, t, h = text_embeds.shape
    flat = image_features.reshape(-1, h).astype(text_embeds.dtype)
    mask = (input_ids == image_token_id).reshape(-1)
    idx = jnp.clip(jnp.cumsum(mask) - 1, 0, flat.shape[0] - 1)
    merged = jnp.where(
        mask[:, None], flat[idx], text_embeds.reshape(-1, h)
    )
    return merged.reshape(b, t, h)


def llava_forward(
    weights: dict,
    cfg: LlavaConfig,
    input_ids: jax.Array,  # [B, T] with image placeholders pre-expanded
    pixel_values: Optional[jax.Array],  # [N_img, 3, H, W] or None
    positions: jax.Array,
    cache: KVCache,
    kv_start: jax.Array,
    *,
    backend=None,
    logits_last_only: bool = False,
    compute_dtype=jnp.bfloat16,
):
    text_w = weights["text"]
    embeds = embedding_lookup(input_ids, text_w["embed"], dtype=compute_dtype)
    if pixel_values is not None:
        feats = encode_images(weights, cfg, pixel_values, compute_dtype=jnp.float32)
        embeds = merge_image_embeddings(
            embeds, input_ids, feats, cfg.image_token_id
        )
    return forward(
        text_w, cfg.text, input_ids, positions, cache, kv_start,
        backend=backend, logits_last_only=logits_last_only,
        compute_dtype=compute_dtype, input_embeds=embeds,
    )


def load_llava_model(path: str, dtype=jnp.bfloat16, isq=None):
    from .hf_loader import load_safetensors_dir

    path = Path(path)
    with open(path / "config.json") as f:
        hf_cfg = json.load(f)
    cfg = LlavaConfig.from_hf(hf_cfg)
    sd = load_safetensors_dir(path)
    weights = llava_weights_from_state_dict(sd, cfg, dtype=dtype, isq=isq)
    return cfg, weights, hf_cfg


# Shared across all VLM families (generic, namespaced by model family).
from ..multimodal import EncoderCache  # noqa: E402  (re-export)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: LlavaConfig,
    prompt_ids: list[int],
    pixel_values,
    encoder_cache: Optional[EncoderCache] = None,
    compute_dtype=jnp.bfloat16,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for Engine.add_request:
    vision features merged into token embeddings at placeholder positions."""
    from ..multimodal import prepare_vlm_prompt

    return prepare_vlm_prompt(
        prompt_ids, pixel_values,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=lambda pv: encode_images(
            weights, cfg, jnp.asarray(pv), compute_dtype=jnp.float32
        ),
        encoder_cache=encoder_cache,
        cache_namespace="llava",
        compute_dtype=compute_dtype,
    )
