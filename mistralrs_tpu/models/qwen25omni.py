"""Qwen2.5-Omni THINKER — the analog of the reference's
`mistralrs-core/src/vision_models/qwen2_5_omni/` understanding path: the
chunked whisper-style audio tower (`audio/qwen25omni.py`) and the
Qwen2.5-VL windowed vision tower feed placeholder slots of a qwen2.5
decoder with TMRoPE (audio-only prompts reduce to plain sequential
positions; image prompts use the qwen2-vl grid scheme). The talker /
token2wav TTS stack is out of scope — the thinker is the text-generating
half the reference serves for understanding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..audio.qwen25omni import (
    Qwen25OmniAudioConfig,
    qwen25omni_audio_encode,
    qwen25omni_audio_params,
)
from ..vision.qwen2vl import Qwen25VLVisionConfig
from .config import ModelConfig, config_from_hf
from .qwen2vl import mrope_position_ids


@dataclass(frozen=True)
class Qwen25OmniThinkerConfig:
    text: ModelConfig
    audio: Qwen25OmniAudioConfig
    vision: Qwen25VLVisionConfig
    audio_token_id: int
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen25OmniThinkerConfig":
        d = dict(d.get("thinker_config", d))
        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["Qwen2ForCausalLM"]})
        sec = tuple((tc.get("rope_scaling") or {}).get("mrope_section", ()))
        text = __import__("dataclasses").replace(
            text, rope_scaling=None, mrope_section=sec
        )
        return cls(
            text=text,
            audio=Qwen25OmniAudioConfig.from_hf(d["audio_config"]),
            vision=Qwen25VLVisionConfig.from_hf(d["vision_config"]),
            # HF serializes these as *_token_index (attribute_map renames)
            audio_token_id=d.get("audio_token_index",
                                 d.get("audio_token_id", 151646)),
            image_token_id=d.get("image_token_index",
                                 d.get("image_token_id", 151655)),
        )


def qwen25omni_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen25OmniThinkerConfig,
    dtype=jnp.float32, **text_kwargs,
) -> dict:
    from ..vision.qwen2vl import qwen25vl_vision_params
    from .hf_loader import weights_from_state_dict

    pre = "thinker." if any(k.startswith("thinker.") for k in sd) else ""
    text_sd = {
        k[len(pre):]: v for k, v in sd.items()
        if k.startswith(pre + "model.") or k == pre + "lm_head.weight"
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "audio": qwen25omni_audio_params(
            sd, cfg.audio, prefix=pre + "audio_tower.", dtype=jnp.float32
        ),
        "vision": qwen25vl_vision_params(
            {k[len(pre + "visual."):]: v for k, v in sd.items()
             if k.startswith(pre + "visual.")},
            cfg.vision, dtype=jnp.float32,
        ),
    }


def num_audio_tokens(cfg: Qwen25OmniThinkerConfig, n_mel_frames: int) -> int:
    return ((n_mel_frames - 1) // 2 + 1) // 2


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Qwen25OmniThinkerConfig,
    prompt_ids: list[int],
    mel=None,  # [F, T] log-mel or None
    patches=None,  # [N, C*tps*p*p] or None (image path)
    grid_thw: Optional[tuple[int, int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash, mrope_positions
    [3, T] or None)."""
    from ..multimodal import prepare_vlm_prompt
    from ..vision.qwen2vl import qwen25vl_vision_forward

    if mel is not None:
        ids, embeds, extra = prepare_vlm_prompt(
            prompt_ids, np.asarray(mel),
            embed_weights=weights["text"]["embed"],
            image_token_id=cfg.audio_token_id,
            encode=lambda pv: qwen25omni_audio_encode(
                weights["audio"], cfg.audio, jnp.asarray(pv)
            )[None],
            encoder_cache=encoder_cache,
            cache_namespace="qwen25omni_audio",
            compute_dtype=compute_dtype,
        )
        # audio-only prompts: all three TMRoPE streams advance together →
        # standard rope (HF get_rope_index else-branch)
        return ids, embeds, extra, None
    ids, embeds, extra = prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=lambda pv: qwen25vl_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv), grid_thw
        )[None],
        encoder_cache=encoder_cache,
        cache_namespace="qwen25omni_image",
        compute_dtype=compute_dtype,
    )
    pos3 = mrope_position_ids(
        np.asarray(prompt_ids), cfg.image_token_id,
        grid_thw if patches is not None else (0, 0, 0),
        merge=cfg.vision.spatial_merge_size,
    )
    return ids, embeds, extra, pos3
