"""Phi-4-multimodal (image + audio modalities) — the analog of the reference's
`mistralrs-core/src/vision_models/phi4/`: a SigLIP-style tower with
idefics-style bucketized patch positions and an attention-pooling head
(unused for features), HD crop assembly (sub-image grid + separator
extensors + global thumbnail), 2x2 average-pool token compression, and a
gelu projection into the phi-4-mini (phi3-family) decoder — engine-served
through the prompt-embeds path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..vision.clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class Phi4MMConfig:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int
    crop_size: int
    feature_layer: int
    audio: Optional[Any] = None  # audio/phi4mm.py Phi4MMAudioConfig
    audio_token_id: int = 200011

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Phi4MMConfig":
        text = config_from_hf(dict(d) | {"architectures": ["Phi3ForCausalLM"]})
        vc = d["vision_config"]
        import dataclasses

        audio = None
        audio_token_id = 200011
        if d.get("audio_config"):
            from ..audio.phi4mm import Phi4MMAudioConfig

            audio = Phi4MMAudioConfig.from_hf(d["audio_config"])
            audio_token_id = audio.audio_token_id
        return cls(
            text=text,
            # is_causal=True in HF's Phi4MultimodalVisionAttention: the sdpa
            # path runs the tower causally for full patch masks
            vision=dataclasses.replace(
                VisionConfig.from_hf(vc, family="siglip"), causal=True
            ),
            image_token_id=vc.get("image_token_id", 200010),
            crop_size=vc.get("crop_size", 448),
            feature_layer=vc.get("feature_layer", -2),
            audio=audio,
            audio_token_id=audio_token_id,
        )


def phi4mm_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Phi4MMConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    img = "model.embed_tokens_extend.image_embed."
    text_sd = {
        k: v for k, v in sd.items()
        if not k.startswith("model.embed_tokens_extend.")
    }
    vision = _phi4_vision_weights(sd, img, cfg.vision)
    g = lambda k: jnp.asarray(sd[img + k], jnp.float32)  # noqa: E731
    out = {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": vision,
        "proj_up": g("img_projection_up.weight"),
        "proj_up_b": g("img_projection_up.bias"),
        "proj_down": g("img_projection_down.weight"),
        "proj_down_b": g("img_projection_down.bias"),
        "glb_ext": g("global_img_feature_extensor")[0, 0],  # [D]
        "sub_ext": g("sub_img_feature_extensor")[0, 0, 0],  # [D]
    }
    aud = "model.embed_tokens_extend.audio_embed."
    if cfg.audio is not None and any(k.startswith(aud) for k in sd):
        from ..audio.phi4mm import (
            phi4mm_audio_params,
            phi4mm_audio_projection_params,
        )

        out["audio"] = phi4mm_audio_params(
            sd, cfg.audio, prefix=aud + "encoder.")
        out["audio_proj"] = phi4mm_audio_projection_params(sd, prefix=aud)
    return out


def _phi4_vision_weights(sd, img_prefix, vcfg):
    """The tower keys live under img_processor.* with idefics-style names
    (encoder.layers.N, embeddings.patch/position); reuse the shared siglip
    tower loader by re-prefixing to its vision_model.* convention."""
    remapped = {}
    p = img_prefix + "img_processor."
    for k, v in sd.items():
        if k.startswith(p):
            remapped["vision_model." + k[len(p):]] = v
    return vision_weights_from_hf(remapped, "", vcfg, dtype=jnp.float32)


def _phi4_position_ids(n_side: int) -> np.ndarray:
    """Phi-4's patch-position bucketization for full attention masks. Unlike
    idefics3's `j/n·(1-1e-6)` fractional coords (which shift every bucket
    down by one), phi4 uses `arange(0, 1-1e-6, 1/n)` — exact multiples of
    1/n — so full-size crops map to the plain grid (identity), modulo f32
    accumulation quirks that this mirrors with the same f32 arithmetic."""
    boundaries = np.arange(1, n_side, dtype=np.float32) / np.float32(n_side)
    coords = np.arange(0, 1 - 1e-6, 1 / n_side, dtype=np.float32)
    b = np.searchsorted(boundaries, coords, side="right")
    return (b[:, None] * n_side + b[None, :]).reshape(-1)


def encode_images(
    weights: dict,
    cfg: Phi4MMConfig,
    pixel_values: jax.Array,  # [n_crops, 3, S, S] — global crop FIRST
    image_size: tuple[int, int],  # padded HD size (multiples of crop_size)
    compute_dtype=jnp.float32,
) -> jax.Array:
    """→ [1, n_tokens, H_text] HD-assembled image tokens (HF
    Phi4MultimodalImageEmbedding parity for full attention masks)."""
    n_side = cfg.vision.image_size // cfg.vision.patch_size
    wv = dict(weights["vision"])
    wv["pos_embed"] = weights["vision"]["pos_embed"][
        _phi4_position_ids(n_side)
    ]
    feats = vision_tower_forward(
        wv, cfg.vision, pixel_values,
        feature_layer=cfg.feature_layer, compute_dtype=compute_dtype,
    )  # [n_crops, n_side², D]
    d = feats.shape[-1]
    # 2x2 average-pool token compression (reflection-pad right/bottom by
    # one when the grid side is odd, matching nn.ReflectionPad2d((0,1,0,1)))
    grid = feats.reshape(-1, n_side, n_side, d)
    if n_side % 2:
        grid = jnp.concatenate([grid, grid[:, -2:-1]], axis=1)
        grid = jnp.concatenate([grid, grid[:, :, -2:-1]], axis=2)
    s2 = grid.shape[1] // 2
    comp = grid.reshape(-1, s2, 2, grid.shape[2] // 2, 2, d).mean(axis=(2, 4))
    base = s2

    hr = image_size[0] // cfg.crop_size
    wr = image_size[1] // cfg.crop_size
    glb = comp[0]  # [base, base, D]
    sub = comp[1 : 1 + hr * wr]
    sub_ext = jnp.broadcast_to(weights["sub_ext"], (hr * base, 1, d))
    sub_img = (
        sub.reshape(hr, wr, base, base, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hr * base, wr * base, d)
    )
    sub_flat = jnp.concatenate([sub_img, sub_ext], axis=1).reshape(-1, d)
    glb_ext = jnp.broadcast_to(weights["sub_ext"], (base, 1, d))
    glb_flat = jnp.concatenate([glb, glb_ext], axis=1).reshape(-1, d)
    tokens = jnp.concatenate(
        [sub_flat, weights["glb_ext"][None], glb_flat], axis=0
    )
    h = jax.nn.gelu(
        tokens @ weights["proj_up"].T + weights["proj_up_b"], approximate=False
    )
    return (h @ weights["proj_down"].T + weights["proj_down_b"])[None]


def num_image_tokens(cfg: Phi4MMConfig, image_size: tuple[int, int]) -> int:
    n_side = cfg.vision.image_size // cfg.vision.patch_size
    base = (n_side + n_side % 2) // 2
    hr = image_size[0] // cfg.crop_size
    wr = image_size[1] // cfg.crop_size
    return hr * base * (wr * base + 1) + 1 + base * (base + 1)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Phi4MMConfig,
    prompt_ids: list[int],
    pixel_values,  # [n_crops, 3, S, S] or None
    image_size: Optional[tuple[int, int]] = None,
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
            weights, cfg, jnp.asarray(pv), image_size,
            compute_dtype=compute_dtype,
        ),
        encoder_cache=encoder_cache,
        cache_namespace="phi4mm",
        compute_dtype=compute_dtype,
    )


def prepare_audio_prompt(
    weights: dict,
    cfg: Phi4MMConfig,
    prompt_ids: list[int],
    mel_features,  # [T_mel, n_mels] log-mel (audio/phi4mm.py phi4mm_logmel)
    encoder_cache=None,
    compute_dtype=jnp.float32,
    projection_mode: str = "speech",
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) — the conformer
    states projected through the speech pair and merged at the audio
    placeholder span (the phi4 audio embedding,
    `vision_models/phi4/mod.rs:448-451`)."""
    from ..audio.phi4mm import audio_project, conformer_encode
    from ..multimodal import prepare_vlm_prompt

    def encode(feats):
        states = conformer_encode(weights["audio"], cfg.audio,
                                  jnp.asarray(feats)[None])
        return audio_project(weights["audio_proj"], states,
                             mode=projection_mode).astype(compute_dtype)

    return prepare_vlm_prompt(
        prompt_ids, mel_features,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.audio_token_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="phi4mm_audio",
        compute_dtype=compute_dtype,
    )
