"""Qwen3.5 (hybrid GDN vision-language) — the analog of the reference's
`mistralrs-core/src/vision_models/qwen3_5/`: the Qwen3-VL DeepStack vision
tower feeding a Qwen3-Next-style text stack (gated DeltaNet linear layers
with a full gated-attention layer every `full_attention_interval`, dense
silu MLPs, interleaved M-RoPE over the partial rotary channels) — served
through the Qwen3NextAdapter's embeds/M-RoPE/DeepStack path. No
transformers class for this arch exists in the image; tests are
reference-structural + engine determinism.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..vision.qwen3vl import Qwen3VLVisionConfig
from .qwen2vl import mrope_position_ids
from .qwen3next import Qwen3NextConfig


@dataclass(frozen=True)
class Qwen35Config:
    text: Qwen3NextConfig
    vision: Qwen3VLVisionConfig
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen35Config":
        tc = dict(d["text_config"])
        rp = tc.get("rope_parameters") or {}
        interval = tc.get("full_attention_interval", 4)
        layer_types = tuple(
            "full_attention" if (i + 1) % interval == 0 else "linear_attention"
            for i in range(tc["num_hidden_layers"])
        )
        text = Qwen3NextConfig.from_hf(
            tc
            | {
                "layer_types": list(layer_types),
                "rope_theta": rp.get("rope_theta", 10_000_000.0),
                "partial_rotary_factor": rp.get("partial_rotary_factor", 0.25),
                "num_experts": tc.get("num_experts", 0),
            }
        )
        text = replace(
            text, mrope_section=tuple(rp.get("mrope_section", ()))
        )
        return cls(
            text=text,
            vision=Qwen3VLVisionConfig.from_hf(d["vision_config"]),
            image_token_id=d.get("image_token_id", 151655),
        )


def qwen3_5_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen35Config, dtype=jnp.float32,
) -> dict:
    from ..vision.qwen3vl import qwen3vl_vision_params
    from .qwen3next import qwen3next_weights_from_state_dict

    text_sd = {
        "model." + k[len("model.language_model."):]: v
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
    out = {
        "text": qwen3next_weights_from_state_dict(text_sd, cfg.text, dtype=dtype),
    }
    if vis_sd:  # text-only checkpoint slices serve without the tower
        out["vision"] = qwen3vl_vision_params(vis_sd, cfg.vision,
                                              dtype=jnp.float32)
    return out


def num_image_tokens(cfg: Qwen35Config, grid_thw: tuple[int, int, int]) -> int:
    t, h, w = grid_thw
    m = cfg.vision.spatial_merge_size
    return t * (h // m) * (w // m)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Qwen35Config,
    prompt_ids: list[int],
    patches,  # [N, C*tps*p*p] pre-patchified pixels or None
    grid_thw: Optional[tuple[int, int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash, mrope_positions
    [3, T], deepstack_embeds [T, k, H])."""
    from ..multimodal import prepare_vlm_prompt
    from ..vision.qwen3vl import qwen3vl_vision_forward

    ds_holder: dict = {}

    def encode(pv):
        tokens, ds = qwen3vl_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv), grid_thw
        )
        ds_holder["ds"] = np.asarray(ds)
        return tokens[None]

    del encoder_cache  # deepstack rides outside the cached embeds
    ids, embeds, extra = prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=encode,
        encoder_cache=None,
        cache_namespace="qwen3_5",
        compute_dtype=compute_dtype,
    )
    pos3 = mrope_position_ids(
        np.asarray(prompt_ids), cfg.image_token_id,
        grid_thw if patches is not None else (0, 0, 0),
        merge=cfg.vision.spatial_merge_size,
    )
    deepstack_rows = None
    if patches is not None and "ds" in ds_holder:
        ds = ds_holder["ds"]
        t_len = len(prompt_ids)
        deepstack_rows = np.zeros((t_len, ds.shape[0], ds.shape[-1]), np.float32)
        img_pos = np.flatnonzero(np.asarray(prompt_ids) == cfg.image_token_id)
        deepstack_rows[img_pos] = ds.transpose(1, 0, 2)
    return ids, embeds, extra, pos3, deepstack_rows
