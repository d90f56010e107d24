"""Gemma 3 multimodal — SigLIP tower + average-pool soft-embedding
projector into the gemma3 text model's ``<image>`` slots (the analog of
the reference's gemma3 vision support, `vision_models/gemma3/`)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm_gemma
from ..vision.clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .config import ModelConfig, config_from_hf
from .hf_loader import weights_from_state_dict
from .llama import KVCache, forward
from .llava import merge_image_embeddings


@dataclass(frozen=True)
class Gemma3VLConfig:
    text: ModelConfig
    vision: VisionConfig
    mm_tokens_per_image: int
    image_token_id: int
    rms_norm_eps: float = 1e-6

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Gemma3VLConfig":
        text = config_from_hf(
            dict(d["text_config"]) | {"architectures": ["Gemma3ForCausalLM"]}
        )
        return cls(
            text=text,
            vision=VisionConfig.from_hf(d["vision_config"], family="siglip"),
            mm_tokens_per_image=d.get("mm_tokens_per_image", 256),
            image_token_id=d["image_token_id"],
        )


def gemma3_project(weights: dict, cfg: Gemma3VLConfig,
                   vision_out: jax.Array) -> jax.Array:
    """[B, N, D] tower output → [B, mm_tokens, text_hidden] via avg-pool
    over the patch grid, (1+w) RMSNorm, and the soft-embedding matmul."""
    b, n, d = vision_out.shape
    side = int(round(n ** 0.5))
    tok_side = int(round(cfg.mm_tokens_per_image ** 0.5))
    k = side // tok_side
    x = jnp.transpose(vision_out, (0, 2, 1)).reshape(b, d, side, side)
    x = x.reshape(b, d, tok_side, k, tok_side, k).mean(axis=(3, 5))
    x = x.reshape(b, d, tok_side * tok_side).transpose(0, 2, 1)
    x = rms_norm_gemma(x, weights["mm_norm"], cfg.rms_norm_eps)
    return x @ weights["mm_proj"]


def gemma3_vl_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Gemma3VLConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    text_sd = {
        k[len("model.language_model."):]: v
        for k, v in sd.items()
        if k.startswith("model.language_model.")
    }
    if "lm_head.weight" in sd:
        text_sd["lm_head.weight"] = sd["lm_head.weight"]
    vis_sd = {
        k[len("model.vision_tower."):]: v
        for k, v in sd.items()
        if k.startswith("model.vision_tower.")
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": vision_weights_from_hf(vis_sd, "", cfg.vision, dtype=dtype),
        "mm_norm": jnp.asarray(
            np.asarray(
                sd["model.multi_modal_projector.mm_soft_emb_norm.weight"],
                np.float32,
            ), dtype,
        ),
        "mm_proj": jnp.asarray(
            np.asarray(
                sd["model.multi_modal_projector.mm_input_projection_weight"],
                np.float32,
            ), dtype,
        ),
    }


def gemma3_vl_forward(
    weights: dict,
    cfg: Gemma3VLConfig,
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

        tower = vision_tower_forward(
            weights["vision"], cfg.vision, pixel_values,
            feature_layer=-1, compute_dtype=compute_dtype,
        )
        feats = gemma3_project(weights, cfg, tower)
        embeds = embedding_lookup(
            input_ids, weights["text"]["embed"], dtype=compute_dtype
        )
        # gemma scales token embeddings by sqrt(hidden) BEFORE the merge
        embeds = embeds * jnp.asarray(
            cfg.text.embedding_multiplier or cfg.text.hidden_size ** 0.5,
            embeds.dtype,
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
    cfg: Gemma3VLConfig,
    prompt_ids: list[int],
    pixel_values,
    encoder_cache=None,
    compute_dtype=jnp.bfloat16,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving.
    Token embeddings carry gemma's sqrt(hidden) multiplier BEFORE the
    merge (image features are not scaled) — matching gemma3_vl_forward."""
    from ..multimodal import prepare_vlm_prompt

    def encode(pv):
        tower = vision_tower_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv),
            feature_layer=-1, compute_dtype=compute_dtype,
        )
        return gemma3_project(weights, cfg, tower)

    return prepare_vlm_prompt(
        prompt_ids, pixel_values,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="gemma3_vl",
        embed_multiplier=(
            cfg.text.embedding_multiplier or cfg.text.hidden_size ** 0.5
        ),
        compute_dtype=compute_dtype,
    )
