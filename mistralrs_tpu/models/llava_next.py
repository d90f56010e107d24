"""LLaVA-NeXT (v1.6) — the analog of the reference's
`mistralrs-core/src/vision_models/llava/llava_next.rs`: the LLaVA tower +
projector applied to ANYRES tiles (a base thumbnail plus a grid of crops
at the best-fit pinpoint resolution), features unpadded back to the image
aspect and packed row-wise with a learned newline embedding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .llava import LlavaConfig, encode_images, llava_weights_from_state_dict


@dataclass
class LlavaNextConfig:
    base: LlavaConfig
    image_grid_pinpoints: tuple[tuple[int, int], ...]

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "LlavaNextConfig":
        return cls(
            base=LlavaConfig.from_hf(d),
            image_grid_pinpoints=tuple(
                tuple(p) for p in d.get("image_grid_pinpoints", [])
            ),
        )

    # pipeline-facing passthroughs
    @property
    def text(self):
        return self.base.text

    @property
    def vision(self):
        return self.base.vision

    @property
    def image_token_id(self):
        return self.base.image_token_id


def llava_next_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: LlavaNextConfig, **kw
) -> dict:
    w = llava_weights_from_state_dict(sd, cfg.base, **kw)
    newline = sd.get("image_newline", sd.get("model.image_newline"))
    if newline is not None:
        w["image_newline"] = jnp.asarray(newline, jnp.float32)
    return w


def select_best_resolution(
    original: tuple[int, int], pinpoints: Sequence[tuple[int, int]]
) -> tuple[int, int]:
    """HF `select_best_resolution`: maximize effective resolution, then
    minimize waste."""
    oh, ow = original
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


def pack_image_features(
    cfg: LlavaNextConfig,
    tile_features: jax.Array,  # [1 + n_tiles, np, H_text] (base first)
    image_size: tuple[int, int],  # original (H, W)
    image_newline: Optional[jax.Array],  # [H_text]
) -> jax.Array:
    """→ packed features [n_tokens, H_text] (HF `pack_image_features` for
    one image: grid reshape, aspect unpad, newline column, base prepend)."""
    side = cfg.vision.image_size // cfg.vision.patch_size
    base = tile_features[0]
    tiles = tile_features[1:]
    bh, bw = select_best_resolution(image_size, cfg.image_grid_pinpoints)
    gh, gw = bh // cfg.vision.image_size, bw // cfg.vision.image_size
    d = tiles.shape[-1]
    f = tiles.reshape(gh, gw, side, side, d)
    f = f.transpose(4, 0, 2, 1, 3).reshape(d, gh * side, gw * side)
    # unpad to the original aspect ratio
    oh, ow = image_size
    ch, cw = f.shape[1], f.shape[2]
    if ow / oh > cw / ch:
        nh = int(round(oh * (cw / ow), 7))
        pad = (ch - nh) // 2
        f = f[:, pad : ch - pad]
    else:
        nw = int(round(ow * (ch / oh), 7))
        pad = (cw - nw) // 2
        f = f[:, :, pad : cw - pad]
    if image_newline is not None:
        nl = jnp.broadcast_to(
            image_newline[:, None, None].astype(f.dtype), (d, f.shape[1], 1)
        )
        f = jnp.concatenate([f, nl], axis=2)
    f = f.reshape(d, -1).T  # [rows*(cols+1), d]
    return jnp.concatenate([base, f], axis=0)


def num_image_tokens(cfg: LlavaNextConfig, image_size: tuple[int, int]) -> int:
    side = cfg.vision.image_size // cfg.vision.patch_size
    bh, bw = select_best_resolution(image_size, cfg.image_grid_pinpoints)
    gh, gw = bh // cfg.vision.image_size, bw // cfg.vision.image_size
    ch, cw = gh * side, gw * side
    oh, ow = image_size
    if ow / oh > cw / ch:
        nh = int(round(oh * (cw / ow), 7))
        pad = (ch - nh) // 2
        rows, cols = ch - 2 * pad, cw
    else:
        nw = int(round(ow * (ch / oh), 7))
        pad = (cw - nw) // 2
        rows, cols = ch, cw - 2 * pad
    return side * side + rows * (cols + 1)


def encode_anyres(
    weights: dict,
    cfg: LlavaNextConfig,
    pixel_values,  # [1 + n_tiles, 3, S, S] (base thumbnail first)
    image_size: tuple[int, int],
    compute_dtype=jnp.float32,
) -> jax.Array:
    feats = encode_images(
        weights, cfg.base, jnp.asarray(pixel_values), compute_dtype=compute_dtype
    )
    return pack_image_features(
        cfg, feats, image_size, weights.get("image_newline")
    )[None]


def prepare_multimodal_prompt(
    weights: dict,
    cfg: LlavaNextConfig,
    prompt_ids: list[int],
    pixel_values,  # [1 + n_tiles, 3, S, S] or None
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
        encode=lambda pv: encode_anyres(
            weights, cfg, pv, image_size, compute_dtype=compute_dtype
        ),
        encoder_cache=encoder_cache,
        cache_namespace="llava_next",
        compute_dtype=compute_dtype,
    )
