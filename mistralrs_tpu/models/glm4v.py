"""GLM-4V / GLM-4.5V vision-language — the analog of the reference's
`mistralrs-core/src/vision_models/glm4v/`: the GLM-4V tower
(`vision/glm4v.py`) feeding image slots of a glm4 decoder whose rotary is
M-RoPE composed with glm's PARTIAL interleaved rotary (sections over the
rotary half, GPT-J pairing, trailing channels pass through).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..vision.glm4v import (
    Glm4vVisionConfig,
    glm4v_vision_forward,
    glm4v_vision_params,
)
from .config import ModelConfig, config_from_hf
from .qwen2vl import mrope_position_ids


@dataclass(frozen=True)
class Glm4vConfig:
    text: ModelConfig
    vision: Glm4vVisionConfig
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Glm4vConfig":
        tc = dict(d["text_config"])
        moe = bool(tc.get("n_routed_experts"))
        arch = "Glm4MoeForCausalLM" if moe else "Glm4ForCausalLM"
        text = config_from_hf(tc | {"architectures": [arch]})
        rs = tc.get("rope_scaling") or {}
        import dataclasses

        text = dataclasses.replace(
            text,
            rope_scaling=None,
            mrope_section=tuple(rs.get("mrope_section", ())),
            # Glm4vMoeTextAttention has NO q/k norms despite the config's
            # use_qk_norm flag (HF modeling ignores it)
            qk_norm=False if moe else text.qk_norm,
        )
        if not moe:
            # Glm4vTextAttention hardcodes head_dim = hidden/heads and
            # bias=True on q/k/v (o_proj bias-free), ignoring config fields;
            # the MoE variant (GLM-4.5V) honors its config fields instead
            text = dataclasses.replace(
                text,
                head_dim=tc["hidden_size"] // tc["num_attention_heads"],
                attention_bias=True,
            )
        return cls(
            text=text,
            vision=Glm4vVisionConfig.from_hf(d["vision_config"]),
            image_token_id=d.get("image_token_id", 151343),
        )


def glm4v_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Glm4vConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    text_sd = {
        k[len("model.language_model."):]: v
        for k, v in sd.items()
        if k.startswith("model.language_model.")
    }
    if "lm_head.weight" in sd:
        text_sd["lm_head.weight"] = sd["lm_head.weight"]
    vis_sd = {
        k[len("model.visual."):]: v
        for k, v in sd.items()
        if k.startswith("model.visual.")
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": glm4v_vision_params(vis_sd, cfg.vision, dtype=jnp.float32),
    }


def num_image_tokens(cfg: Glm4vConfig, grid_thw: tuple[int, int, int]) -> int:
    t, h, w = grid_thw
    m = cfg.vision.spatial_merge_size
    return t * (h // m) * (w // m)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Glm4vConfig,
    prompt_ids: list[int],
    patches,  # [N, C*tps*p*p] pre-patchified pixels or None
    grid_thw: Optional[tuple[int, int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash, mrope_positions
    [3, T]) for ``Engine.add_request``."""
    from ..multimodal import prepare_vlm_prompt

    def encode(pv):
        return glm4v_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv), grid_thw
        )[None]

    ids, embeds, extra = prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="glm4v",
        compute_dtype=compute_dtype,
    )
    pos3 = mrope_position_ids(
        np.asarray(prompt_ids), cfg.image_token_id,
        grid_thw if patches is not None else (0, 0, 0),
        merge=cfg.vision.spatial_merge_size,
    )
    return ids, embeds, extra, pos3
