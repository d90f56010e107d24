"""LFM2-VL — the analog of the reference's
`mistralrs-core/src/vision_models/lfm2_vl/`: a SigLIP2-NaFlex tower
(pre-patchified variable-resolution input, linear patch embedding,
bilinear-resized position embeddings) + pixel-unshuffle downsampling
projector into the LFM2 conv/attention hybrid decoder — engine-served
through the prompt-embeds path (Lfm2Adapter).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm
from ..vision.clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .lfm2 import Lfm2Config


@dataclass(frozen=True)
class Lfm2VlConfig:
    text: Lfm2Config
    vision: VisionConfig
    image_token_id: int
    downsample_factor: int
    projector_act: str  # "gelu" (exact erf form in HF's ACT2FN)

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Lfm2VlConfig":
        vc = dict(d["vision_config"])
        # siglip2-naflex: num_patches is the learned position grid (S²);
        # express it through VisionConfig's image_size so seq-len math holds
        side = int(round(vc["num_patches"] ** 0.5))
        vc["image_size"] = side * vc["patch_size"]
        return cls(
            text=Lfm2Config.from_hf(dict(d["text_config"])),
            vision=VisionConfig.from_hf(vc, family="siglip"),
            image_token_id=d.get("image_token_id", 396),
            downsample_factor=d.get("downsample_factor", 2),
            projector_act=d.get("projector_hidden_act", "gelu"),
        )


def lfm2_vl_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Lfm2VlConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .lfm2 import lfm2_weights_from_state_dict

    text_sd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            text_sd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            text_sd[k] = v
    p = "model.multi_modal_projector."
    g = lambda k: jnp.asarray(sd[p + k], jnp.float32)  # noqa: E731
    return {
        "text": lfm2_weights_from_state_dict(text_sd, cfg.text, **text_kwargs),
        "vision": vision_weights_from_hf(
            sd, "model.vision_tower.", cfg.vision, dtype=jnp.float32
        ),
        "proj_ln": g("layer_norm.weight"),
        "proj_ln_b": g("layer_norm.bias"),
        "proj_w1": g("linear_1.weight"),
        "proj_b1": g("linear_1.bias"),
        "proj_w2": g("linear_2.weight"),
        "proj_b2": g("linear_2.bias"),
    }


def _resized_pos_embed(pos: jax.Array, side: int, h: int, w: int) -> jax.Array:
    """[S², D] learned grid → [h*w, D] bilinear (antialiased, matching
    torch F.interpolate(..., mode='bilinear', antialias=True))."""
    grid = pos.reshape(side, side, -1).astype(jnp.float32)
    out = jax.image.resize(grid, (h, w, grid.shape[-1]), method="linear",
                           antialias=True)
    return out.reshape(h * w, -1)


def encode_image(
    weights: dict,
    cfg: Lfm2VlConfig,
    patches: jax.Array,  # [N, 3*p*p] pre-patchified rows (row-major grid)
    spatial_shape: tuple[int, int],  # (h, w) in patches, multiples of factor
    compute_dtype=jnp.float32,
) -> jax.Array:
    """→ [1, (h/f)*(w/f), H_text] projected image tokens (HF
    `Lfm2VlModel.get_image_features` for one unpadded image)."""
    h, w = spatial_shape
    f = cfg.downsample_factor
    vw = weights["vision"]
    x = patches.astype(compute_dtype)[None]  # [1, N, 3pp]
    emb = x @ vw["patch_embed"].astype(compute_dtype)
    emb = emb + vw["patch_bias"].astype(compute_dtype)
    side = cfg.vision.image_size // cfg.vision.patch_size
    emb = emb + _resized_pos_embed(vw["pos_embed"], side, h, w)[None]
    feats = vision_tower_forward(
        vw, cfg.vision, None, feature_layer=-1,
        compute_dtype=compute_dtype, inputs_embeds=emb,
    )  # [1, h*w, D] (post-layernormed last hidden state)
    d = feats.shape[-1]
    # HF pixel_unshuffle (dims named (b, W, H, C) but applied to (1, h, w, C))
    t = feats.reshape(1, h, w // f, d * f)
    t = t.transpose(0, 2, 1, 3).reshape(1, w // f, h // f, d * f * f)
    t = t.transpose(0, 2, 1, 3)  # [1, h/f, w/f, D·f²]
    t = layer_norm(t, weights["proj_ln"], weights["proj_ln_b"], 1e-5)
    t = t @ weights["proj_w1"].T + weights["proj_b1"]
    t = jax.nn.gelu(t, approximate=cfg.projector_act != "gelu")
    t = t @ weights["proj_w2"].T + weights["proj_b2"]
    return t.reshape(1, (h // f) * (w // f), -1)


def num_image_tokens(cfg: Lfm2VlConfig, spatial_shape: tuple[int, int]) -> int:
    h, w = spatial_shape
    f = cfg.downsample_factor
    return (h // f) * (w // f)


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Lfm2VlConfig,
    prompt_ids: list[int],
    patches,  # [N, 3*p*p] or None
    spatial_shape: Optional[tuple[int, int]] = None,
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving."""
    from ..multimodal import prepare_vlm_prompt

    return prepare_vlm_prompt(
        prompt_ids, patches,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=lambda pv: encode_image(
            weights, cfg, jnp.asarray(pv), spatial_shape,
            compute_dtype=compute_dtype,
        ),
        encoder_cache=encoder_cache,
        cache_namespace="lfm2_vl",
        compute_dtype=compute_dtype,
    )
