"""Qwen3-Omni MoE THINKER (audio understanding) — the analog of the
reference's qwen3-omni support: the /8-downsampling chunked audio tower
(`audio/qwen25omni.py` Qwen3Omni variant) feeding audio slots of a
qwen3-moe decoder. Audio-only prompts use plain sequential positions (the
TMRoPE else-branch); the talker/code2wav stack is out of scope.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..audio.qwen25omni import (
    Qwen3OmniAudioConfig,
    aftercnn_length,
    qwen3omni_audio_encode,
    qwen3omni_audio_params,
)
from .config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class Qwen3OmniThinkerConfig:
    text: ModelConfig
    audio: Qwen3OmniAudioConfig
    audio_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen3OmniThinkerConfig":
        d = dict(d.get("thinker_config", d))
        tc = dict(d["text_config"])
        arch = (
            "Qwen3MoeForCausalLM" if tc.get("num_experts")
            else "Qwen3ForCausalLM"
        )
        text = config_from_hf(tc | {"architectures": [arch]})
        rs = tc.get("rope_scaling") or {}
        text = __import__("dataclasses").replace(
            text,
            rope_scaling=None,
            mrope_section=tuple(rs.get("mrope_section", ())),
            mrope_interleaved=bool(rs.get("mrope_interleaved", True)),
        )
        return cls(
            text=text,
            audio=Qwen3OmniAudioConfig.from_hf(d["audio_config"]),
            audio_token_id=d.get("audio_token_index",
                                 d.get("audio_token_id", 151646)),
        )


def qwen3omni_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen3OmniThinkerConfig,
    dtype=jnp.float32, **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    pre = "thinker." if any(k.startswith("thinker.") for k in sd) else ""
    text_sd = {
        k[len(pre):]: v for k, v in sd.items()
        if k.startswith(pre + "model.") or k == pre + "lm_head.weight"
    }
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "audio": qwen3omni_audio_params(
            sd, cfg.audio, prefix=pre + "audio_tower.", dtype=jnp.float32
        ),
    }


def num_audio_tokens(cfg: Qwen3OmniThinkerConfig, n_mel_frames: int) -> int:
    n2 = cfg.audio.n_window * 2
    return sum(
        aftercnn_length(min(n2, n_mel_frames - s))
        for s in range(0, n_mel_frames, n2)
    )


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Qwen3OmniThinkerConfig,
    prompt_ids: list[int],
    mel,  # [F, T] log-mel
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash)."""
    from ..multimodal import prepare_vlm_prompt

    return prepare_vlm_prompt(
        prompt_ids, np.asarray(mel),
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.audio_token_id,
        encode=lambda pv: qwen3omni_audio_encode(
            weights["audio"], cfg.audio, jnp.asarray(pv)
        )[None],
        encoder_cache=encoder_cache,
        cache_namespace="qwen3omni_audio",
        compute_dtype=compute_dtype,
    )
