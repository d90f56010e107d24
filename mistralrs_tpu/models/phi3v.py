"""Phi-3-vision / Phi-3.5-vision — the analog of the reference's
`mistralrs-core/src/vision_models/phi3/` (mod.rs:680-900): CLIP-L tower
(feature layer −2, CLS dropped), 2x2 feature shuffle to 4C channels, HD
assembly `sub_glb`: sub-crop rows + a sub_GN column, a glb_GN separator
row, then the global 12x13 block — projected by a 2-layer GELU MLP into
the phi3 decoder. No transformers class exists for this arch in the image,
so parity is structural (separator placement, token-count formula,
checkpoint key layout of microsoft/Phi-3-vision) rather than vs HF.
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
class Phi3VConfig:
    text: ModelConfig
    vision: VisionConfig
    image_dim_out: int
    crop_size: int  # 336
    hd_transform_order: str  # "sub_glb" | "glb_sub"
    image_token_id: int  # serving placeholder (HF uses negative ids)

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Phi3VConfig":
        text = config_from_hf(dict(d) | {"architectures": ["Phi3ForCausalLM"]})
        emb = d.get("embd_layer", {})
        img = d.get("img_processor") or {
            # microsoft/Phi-3-vision defaults: CLIP ViT-L/14-336
            "image_dim_out": 1024, "model_name": "openai/clip-vit-large-patch14-336",
        }
        vision = VisionConfig(
            hidden_size=img.get("image_dim_out", 1024),
            intermediate_size=img.get("intermediate_size", 4096),
            num_layers=img.get("num_hidden_layers", 24),
            num_heads=img.get("num_attention_heads", 16),
            image_size=img.get("image_size", 336),
            patch_size=img.get("patch_size", 14),
            hidden_act="quick_gelu",
            layer_norm_eps=1e-5,
            use_class_token=True,
            pre_layernorm=True,
        )
        return cls(
            text=text,
            vision=vision,
            image_dim_out=img.get("image_dim_out", 1024),
            crop_size=img.get("image_size", 336),
            hd_transform_order=emb.get("hd_transform_order", "sub_glb"),
            image_token_id=d.get("image_token_id", 32010),
        )


def phi3v_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Phi3VConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    v = "model.vision_embed_tokens."
    text_sd = {k: x for k, x in sd.items() if not k.startswith(v)}
    g = lambda k: jnp.asarray(sd[v + k], jnp.float32)  # noqa: E731
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": vision_weights_from_hf(
            sd, v + "img_processor.", cfg.vision, dtype=jnp.float32
        ),
        "glb_gn": g("glb_GN")[0, 0],  # [4C]
        "sub_gn": g("sub_GN")[0, 0, 0],  # [4C]
        "proj_w1": g("img_projection.0.weight"),
        "proj_b1": g("img_projection.0.bias"),
        "proj_w2": g("img_projection.2.weight"),
        "proj_b2": g("img_projection.2.bias"),
    }


def _shuffle_2x2(x: jax.Array, side: int, c: int) -> jax.Array:
    """[N, side², C] → [N, side/2, side/2, 4C] (mod.rs:829-836 reshape
    chain: 2x2 spatial blocks concatenated channel-wise)."""
    n = x.shape[0]
    x = x.reshape(n, side // 2, 2, side // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, side // 2, side // 2, 4 * c)


def num_image_tokens(cfg: Phi3VConfig, image_size: tuple[int, int]) -> int:
    """(B+1)·144 + 1 + (h+1)·12 for an h×w crop grid (mod.rs:806)."""
    h = image_size[0] // cfg.crop_size
    w = image_size[1] // cfg.crop_size
    base = (cfg.crop_size // cfg.vision.patch_size) // 2  # 12
    return (h * w + 1) * base * base + 1 + (h + 1) * base


def encode_images(
    weights: dict,
    cfg: Phi3VConfig,
    pixel_values: jax.Array,  # [n_crops, 3, S, S] — GLOBAL crop FIRST
    image_size: tuple[int, int],  # padded HD size (multiples of crop_size)
    compute_dtype=jnp.float32,
) -> jax.Array:
    """→ [1, n_tokens, H_text] HD-assembled image tokens."""
    feats = vision_tower_forward(
        weights["vision"], cfg.vision, pixel_values,
        feature_layer=-2, compute_dtype=compute_dtype,
    )[:, 1:]  # drop CLS
    c = cfg.image_dim_out
    side = cfg.crop_size // cfg.vision.patch_size  # 24
    base = side // 2  # 12
    shuffled = _shuffle_2x2(feats, side, c)  # [n, 12, 12, 4C]

    h = image_size[0] // cfg.crop_size
    w = image_size[1] // cfg.crop_size
    glb = shuffled[0]  # [12, 12, 4C]
    sub_gn = weights["sub_gn"].astype(shuffled.dtype)
    glb_rows = jnp.concatenate(
        [glb, jnp.broadcast_to(sub_gn, (base, 1, 4 * c))], axis=1
    ).reshape(-1, 4 * c)  # [12*13, 4C]

    sub = shuffled[1 : 1 + h * w]  # [h*w, 12, 12, 4C]
    sub = (
        sub.reshape(h, w, base, base, 4 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(h * base, w * base, 4 * c)
    )
    sub_rows = jnp.concatenate(
        [sub, jnp.broadcast_to(sub_gn, (h * base, 1, 4 * c))], axis=1
    ).reshape(-1, 4 * c)

    glb_gn = weights["glb_gn"].astype(shuffled.dtype)[None]
    if cfg.hd_transform_order == "glb_sub":
        tokens = jnp.concatenate([glb_rows, glb_gn, sub_rows], axis=0)
    else:  # sub_glb (phi-3.5-vision default)
        tokens = jnp.concatenate([sub_rows, glb_gn, glb_rows], axis=0)
    x = tokens @ weights["proj_w1"].T + weights["proj_b1"]
    x = jax.nn.gelu(x, approximate=False)
    return (x @ weights["proj_w2"].T + weights["proj_b2"])[None]


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Phi3VConfig,
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
        cache_namespace="phi3v",
        compute_dtype=compute_dtype,
    )
