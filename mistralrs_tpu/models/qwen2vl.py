"""Qwen2-VL vision-language model — the analog of the reference's
`vision_models/qwen2vl/`: the Qwen2-VL vision tower (`vision/qwen2vl.py`)
feeding `<image>` slots of a qwen2 text model whose rotary embedding is
**M-RoPE**: three position streams (temporal / height / width) share the
head dim by channel sections; text tokens use identical positions in all
three streams, vision tokens get their grid coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..vision.qwen2vl import (
    Qwen2VLVisionConfig,
    qwen2vl_vision_forward,
    qwen2vl_vision_params,
)
from .config import ModelConfig, config_from_hf
from .hf_loader import weights_from_state_dict
from .llama import KVCache, forward
from .llava import merge_image_embeddings


@dataclass(frozen=True)
class Qwen2VLConfig:
    text: ModelConfig
    vision: Qwen2VLVisionConfig
    mrope_section: tuple[int, ...]
    image_token_id: int
    video_token_id: Optional[int] = None

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen2VLConfig":
        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["Qwen2ForCausalLM"]})
        sec = tuple((tc.get("rope_scaling") or {}).get("mrope_section", ()))
        # mrope keeps plain rotary frequencies — drop the scaling marker;
        # record the sections on the text config so the serving engine's
        # forward_paged can run M-RoPE decode/prefill (rope_positions3)
        text = __import__("dataclasses").replace(
            text, rope_scaling=None, mrope_section=sec
        )
        return cls(
            text=text,
            vision=Qwen2VLVisionConfig.from_hf(d["vision_config"]),
            mrope_section=sec,
            image_token_id=d["image_token_id"],
            video_token_id=d.get("video_token_id"),
        )


@dataclass(frozen=True)
class Qwen25VLConfig:
    """Qwen2.5-VL: same M-RoPE text serving as qwen2-vl, with the windowed
    RMSNorm tower (`vision/qwen2vl.py` Qwen25VL variant) — the analog of the
    reference's `vision_models/qwen2_5_vl/`."""

    text: ModelConfig
    vision: "Qwen25VLVisionConfig"
    mrope_section: tuple[int, ...]
    image_token_id: int
    video_token_id: Optional[int] = None

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen25VLConfig":
        from ..vision.qwen2vl import Qwen25VLVisionConfig

        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["Qwen2ForCausalLM"]})
        sec = tuple((tc.get("rope_scaling") or {}).get("mrope_section", ()))
        text = __import__("dataclasses").replace(
            text, rope_scaling=None, mrope_section=sec
        )
        return cls(
            text=text,
            vision=Qwen25VLVisionConfig.from_hf(d["vision_config"]),
            mrope_section=sec,
            image_token_id=d["image_token_id"],
            video_token_id=d.get("video_token_id"),
        )


def qwen25vl_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen25VLConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from ..vision.qwen2vl import qwen25vl_vision_params

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
        "vision": qwen25vl_vision_params(vis_sd, cfg.vision, dtype=dtype),
    }


def qwen25vl_prepare_multimodal_prompt(
    weights: dict,
    cfg: Qwen25VLConfig,
    prompt_ids: list[int],
    patches,
    grid_thw: Optional[tuple[int, int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
    media_token_id: Optional[int] = None,  # video spans use video_token_id
):
    """→ (prompt_ids, prompt_embeds, extra_hash, mrope_positions [3, T])."""
    from ..multimodal import prepare_vlm_prompt
    from ..vision.qwen2vl import qwen25vl_vision_forward

    tok_id = media_token_id if media_token_id is not None else cfg.image_token_id

    def encode(pv):
        return qwen25vl_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv), grid_thw
        )[None]

    ids, embeds, extra = prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=tok_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="qwen25vl",
        compute_dtype=compute_dtype,
    )
    pos3 = mrope_position_ids(
        np.asarray(prompt_ids), tok_id,
        grid_thw if patches is not None else (0, 0, 0),
        merge=cfg.vision.spatial_merge_size,
    )
    return ids, embeds, extra, pos3


def mrope_position_ids(
    input_ids: np.ndarray,  # [T] (single sequence)
    image_token_id: int,
    grid_thw: tuple[int, int, int],
    merge: int = 2,
) -> np.ndarray:
    """[3, T] (temporal, height, width) positions — HF `get_rope_index`
    semantics for one image: text advances all three streams together;
    the image span gets its (t, h, w) grid offset by the preceding text
    position; text after the image resumes at max(vision positions) + 1."""
    t_len = len(input_ids)
    pos = np.zeros((3, t_len), np.int64)
    img_mask = input_ids == image_token_id
    if not img_mask.any():
        pos[:] = np.arange(t_len)
        return pos
    start = int(np.argmax(img_mask))
    n_img = int(img_mask.sum())
    t, h, w = grid_thw
    lh, lw = h // merge, w // merge
    assert n_img == t * lh * lw, "image token count != merged grid size"
    pos[:, :start] = np.arange(start)
    tg = np.repeat(np.arange(t), lh * lw)
    hg = np.tile(np.repeat(np.arange(lh), lw), t)
    wg = np.tile(np.arange(lw), t * lh)
    pos[0, start : start + n_img] = start + tg
    pos[1, start : start + n_img] = start + hg
    pos[2, start : start + n_img] = start + wg
    nxt = int(pos[:, start : start + n_img].max()) + 1
    rest = t_len - start - n_img
    pos[:, start + n_img :] = nxt + np.arange(rest)
    return pos


def mrope_cos_sin(
    cfg: Qwen2VLConfig, positions3: jax.Array  # [3, B, T]
) -> tuple[jax.Array, jax.Array]:
    """Section-combined (cos, sin) [B, T, head_dim // 2] for the standard
    rotate-half application."""
    from ..ops.rope import mrope_cos_sin as _mrope

    hd = cfg.text.head_dim
    inv = 1.0 / (
        cfg.text.rope_theta
        ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    return _mrope(positions3, inv, cfg.mrope_section)


def qwen2vl_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen2VLConfig, dtype=jnp.float32,
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
        k[len("model.visual."):]: v
        for k, v in sd.items()
        if k.startswith("model.visual.")
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": qwen2vl_vision_params(vis_sd, cfg.vision, dtype=dtype),
    }


def qwen2vl_forward(
    weights: dict,
    cfg: Qwen2VLConfig,
    input_ids: jax.Array,  # [B, T] with image_token_id slots
    patches,  # [N, C*tps*p*p] pre-patchified pixels or None
    grid_thw: Optional[tuple[int, int, int]],
    positions3: jax.Array,  # [3, B, T] M-RoPE streams
    cache: KVCache,
    kv_start: jax.Array,
    *,
    compute_dtype=jnp.float32,
    logits_last_only: bool = False,
    media_token_id: Optional[int] = None,  # video spans merge on video_token_id
):
    embeds = None
    if patches is not None:
        from ..quant.linear import embedding_lookup

        feats = qwen2vl_vision_forward(
            weights["vision"], cfg.vision, patches, grid_thw
        )[None]
        embeds = embedding_lookup(
            input_ids, weights["text"]["embed"], dtype=compute_dtype
        )
        embeds = merge_image_embeddings(
            embeds, input_ids, feats,
            media_token_id if media_token_id is not None
            else cfg.image_token_id,
        )
    cos, sin = mrope_cos_sin(cfg, positions3)
    # attention masking uses the sequence index (causality is positional in
    # the token stream, independent of the 3D rope streams)
    b, t = input_ids.shape
    seq_pos = kv_start[:, None] + jnp.arange(t)[None]
    return forward(
        weights["text"], cfg.text, input_ids, seq_pos.astype(jnp.int32),
        cache, kv_start, compute_dtype=compute_dtype,
        logits_last_only=logits_last_only, input_embeds=embeds,
        rope_override=(cos, sin),
    )

def prepare_multimodal_prompt(
    weights: dict,
    cfg: Qwen2VLConfig,
    prompt_ids: list[int],
    patches,  # [N, C*tps*p*p] pre-patchified pixels or None
    grid_thw: Optional[tuple[int, int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
    media_token_id: Optional[int] = None,  # video spans use video_token_id
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash, mrope_positions
    [3, T]) for ``Engine.add_request`` — the engine runs M-RoPE prefill from
    the position streams and decode at token-index + delta (all-equal
    streams reduce to standard rope). A VIDEO rides the same path with
    grid_t > 1 and the placeholder span on ``video_token_id`` — the
    temporal M-RoPE stream then advances per temporal patch (reference
    serves videos through the same Qwen2-VL get_rope_index,
    vision_models/qwen2vl/inputs_processor.rs video path)."""
    from ..multimodal import prepare_vlm_prompt

    tok_id = media_token_id if media_token_id is not None else cfg.image_token_id

    def encode(pv):
        # vision features per image token row [N/merge², H] → [1, n, H]
        return qwen2vl_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv), grid_thw
        )[None]

    ids, embeds, extra = prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=tok_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="qwen2vl",
        compute_dtype=compute_dtype,
    )
    pos3 = mrope_position_ids(
        np.asarray(prompt_ids), tok_id,
        grid_thw if patches is not None else (0, 0, 0),
        merge=cfg.vision.spatial_merge_size,
    )
    return ids, embeds, extra, pos3
