"""Qwen3-VL — the analog of the reference's
`mistralrs-core/src/vision_models/qwen3vl/`: the Qwen3-VL tower
(`vision/qwen3vl.py`) feeding `<image>` slots of a qwen3 decoder with
channel-INTERLEAVED M-RoPE, plus DeepStack: per-tap visual features added
to the decoder's hidden states after its first k layers (engine-served via
`forward_paged`'s `deepstack` input).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..vision.qwen3vl import (
    Qwen3VLVisionConfig,
    qwen3vl_vision_forward,
    qwen3vl_vision_params,
)
from .config import ModelConfig, config_from_hf
from .qwen2vl import mrope_position_ids


@dataclass(frozen=True)
class Qwen3VLConfig:
    text: ModelConfig
    vision: Qwen3VLVisionConfig
    image_token_id: int
    video_token_id: Optional[int] = None

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen3VLConfig":
        tc = dict(d["text_config"])
        moe = bool(tc.get("num_experts"))
        arch = "Qwen3MoeForCausalLM" if moe else "Qwen3ForCausalLM"
        text = config_from_hf(tc | {"architectures": [arch]})
        rs = tc.get("rope_scaling") or {}
        text = __import__("dataclasses").replace(
            text,
            rope_scaling=None,
            mrope_section=tuple(rs.get("mrope_section", ())),
            mrope_interleaved=bool(rs.get("mrope_interleaved", True)),
            # Qwen3VLMoeTextSparseMoeBlock always normalizes top-k weights
            norm_topk_prob=True if moe else text.norm_topk_prob,
        )
        return cls(
            text=text,
            vision=Qwen3VLVisionConfig.from_hf(d["vision_config"]),
            image_token_id=d.get("image_token_id", 151655),
            video_token_id=d.get("video_token_id", 151656),
        )


def qwen3_vl_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen3VLConfig, dtype=jnp.float32,
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
    # qwen3-vl-moe stores FUSED expert banks (gate_up_proj [E, H, 2I],
    # down_proj [E, I, H]); split into the per-expert [out, in] keys the
    # shared loader stacks
    fused = [k for k in text_sd if k.endswith("mlp.experts.gate_up_proj")]
    for k in fused:
        base = k[: -len("gate_up_proj")]
        gu = np.asarray(text_sd.pop(k), np.float32)
        dn = np.asarray(text_sd.pop(base + "down_proj"), np.float32)
        inter = gu.shape[-1] // 2
        for e in range(gu.shape[0]):
            text_sd[f"{base}{e}.gate_proj.weight"] = gu[e, :, :inter].T
            text_sd[f"{base}{e}.up_proj.weight"] = gu[e, :, inter:].T
            text_sd[f"{base}{e}.down_proj.weight"] = dn[e].T
    vis_sd = {
        k[len("model.visual."):]: v
        for k, v in sd.items()
        if k.startswith("model.visual.")
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": qwen3vl_vision_params(vis_sd, cfg.vision, dtype=jnp.float32),
    }


def num_image_tokens(cfg: Qwen3VLConfig, grid_thw: tuple[int, int, int]) -> int:
    t, h, w = grid_thw
    m = cfg.vision.spatial_merge_size
    return t * (h // m) * (w // m)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Qwen3VLConfig,
    prompt_ids: list[int],
    patches,  # [N, C*tps*p*p] pre-patchified pixels or None
    grid_thw: Optional[tuple[int, int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
    media_token_id: Optional[int] = None,  # video spans use video_token_id
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash, mrope_positions
    [3, T], deepstack_embeds [T, k, H]) for ``Engine.add_request`` —
    deepstack rows are zeros at text positions and the tap-j feature rows at
    image positions (added after decoder layer j during prefill)."""
    from ..multimodal import prepare_vlm_prompt

    ds_holder: dict = {}

    def encode(pv):
        tokens, ds = qwen3vl_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv), grid_thw
        )
        ds_holder["ds"] = np.asarray(ds)
        return tokens[None]

    # no encoder cache: a cache hit would skip `encode` and lose the
    # deepstack taps, which ride outside the cached [1, n, H] embeds
    del encoder_cache
    ids, embeds, extra = prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=(media_token_id if media_token_id
                        is not None else cfg.image_token_id),
        encode=encode,
        encoder_cache=None,
        cache_namespace="qwen3vl",
        compute_dtype=compute_dtype,
    )
    pos3 = mrope_position_ids(
        np.asarray(prompt_ids),
        media_token_id if media_token_id is not None else cfg.image_token_id,
        grid_thw if patches is not None else (0, 0, 0),
        merge=cfg.vision.spatial_merge_size,
    )
    deepstack_rows = None
    if patches is not None and "ds" in ds_holder:
        ds = ds_holder["ds"]  # [k, n_img, H]
        k = ds.shape[0]
        t_len = len(prompt_ids)
        deepstack_rows = np.zeros((t_len, k, ds.shape[-1]), np.float32)
        img_pos = np.flatnonzero(
        np.asarray(prompt_ids)
        == (media_token_id if media_token_id is not None
            else cfg.image_token_id))
        deepstack_rows[img_pos] = ds.transpose(1, 0, 2)
    return ids, embeds, extra, pos3, deepstack_rows
