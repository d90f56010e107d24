"""Idefics3 / SmolVLM vision-language model — another multimodal family
beside LLaVA (the analog of the reference's idefics3 support,
`mistralrs-core/src/vision_models/idefics3/`).

Pipeline: SigLIP-style vision tower (shared `vision/clip.py` tower; full-
size images reduce Idefics3's bucketed positions to the plain grid) →
pixel-shuffle space-to-depth (scale² patches concatenated channel-wise) →
single linear modality projection → `<image>` token slots in the llama text
stream (shared merge with `models/llava.py`)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..vision.clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .config import ModelConfig, config_from_hf
from .hf_loader import weights_from_state_dict
from .llama import KVCache, forward
from .llava import merge_image_embeddings


@dataclass(frozen=True)
class Idefics3Config:
    text: ModelConfig
    vision: VisionConfig
    scale_factor: int
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Idefics3Config":
        text = config_from_hf(
            dict(d["text_config"])
            | {"architectures": d["text_config"].get("architectures")
               or ["LlamaForCausalLM"]}
        )
        return cls(
            text=text,
            vision=VisionConfig.from_hf(d["vision_config"], family="siglip"),
            scale_factor=d.get("scale_factor", 2),
            image_token_id=d["image_token_id"],
        )


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """[B, N, D] (N = s²) → [B, N/scale², D·scale²] (space-to-depth)."""
    b, n, d = x.shape
    side = int(round(n ** 0.5))
    x = x.reshape(b, side, side, d)
    x = x.reshape(b, side, side // scale, d * scale)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(b, side // scale, side // scale, d * scale * scale)
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(b, n // (scale * scale), d * scale * scale)


def idefics3_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Idefics3Config, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    text_sd = {
        k[len("model.text_model."):]: v
        for k, v in sd.items()
        if k.startswith("model.text_model.")
    }
    if "lm_head.weight" in sd:
        text_sd["lm_head.weight"] = sd["lm_head.weight"]
    vis_sd = {
        k[len("model."):]: v
        for k, v in sd.items()
        if k.startswith("model.vision_model.")
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": vision_weights_from_hf(vis_sd, "", cfg.vision, dtype=dtype),
        "proj": jnp.asarray(
            np.asarray(sd["model.connector.modality_projection.proj.weight"],
                       np.float32), dtype,
        ),
    }


def _bucketed_position_ids(n_side: int) -> np.ndarray:
    """Idefics3's fractional-coordinate bucketization — due to the (1-1e-6)
    epsilon, even FULL-size images map patch index j to bucket
    searchsorted(boundaries, j/n·(1-ε)) (e.g. [0,0,1,2] for n=4), NOT the
    plain grid; real checkpoints are trained with this layout."""
    boundaries = np.arange(1 / n_side, 1.0, 1 / n_side)
    frac = np.arange(n_side) / n_side * (1 - 1e-6)
    b = np.searchsorted(boundaries, frac, side="right")
    return (b[:, None] * n_side + b[None, :]).reshape(-1)


def encode_images(weights: dict, cfg: Idefics3Config, pixel_values: jax.Array,
                  compute_dtype=jnp.float32) -> jax.Array:
    """[B, 3, H, W] → projected image tokens [B, N/scale², text_hidden]."""
    n_side = cfg.vision.image_size // cfg.vision.patch_size
    pos_ids = _bucketed_position_ids(n_side)
    wv = dict(weights["vision"])
    wv["pos_embed"] = weights["vision"]["pos_embed"][pos_ids]
    feats = vision_tower_forward(
        wv, cfg.vision, pixel_values,
        feature_layer=-1, compute_dtype=compute_dtype,
    )
    shuffled = pixel_shuffle(feats, cfg.scale_factor)
    return shuffled @ weights["proj"].T


def idefics3_forward(
    weights: dict,
    cfg: Idefics3Config,
    input_ids: jax.Array,  # [B, T] with image_token_id slots
    pixel_values,  # [B_img, 3, H, W] or None
    positions: jax.Array,
    cache: KVCache,
    kv_start: jax.Array,
    *,
    compute_dtype=jnp.float32,
    logits_last_only: bool = False,
):
    embeds = None
    if pixel_values is not None:
        from ..quant.linear import embedding_lookup

        feats = encode_images(weights, cfg, pixel_values, compute_dtype)
        embeds = embedding_lookup(
            input_ids, weights["text"]["embed"], dtype=compute_dtype
        )
        embeds = merge_image_embeddings(
            embeds, input_ids, feats, cfg.image_token_id
        )
    return forward(
        weights["text"], cfg.text, input_ids, positions, cache, kv_start,
        compute_dtype=compute_dtype, logits_last_only=logits_last_only,
        input_embeds=embeds,
    )


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Idefics3Config,
    prompt_ids: list[int],
    pixel_values,
    encoder_cache=None,
    compute_dtype=jnp.bfloat16,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving
    (vision features merged at <image> placeholders; media digest chained
    into KV block hashes via extra_hash)."""
    from ..multimodal import prepare_vlm_prompt

    return prepare_vlm_prompt(
        prompt_ids, pixel_values,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=lambda pv: encode_images(
            weights, cfg, jnp.asarray(pv), compute_dtype=compute_dtype
        ),
        encoder_cache=encoder_cache,
        cache_namespace="idefics3",
        compute_dtype=compute_dtype,
    )
