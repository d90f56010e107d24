"""Mistral 3 / Pixtral vision-language — the analog of the reference's
`mistralrs-core/src/vision_models/mistral3/` (+ pixtral tower): a 2-D
rotary ViT over variable-size image crops packed into one sequence with
block-diagonal attention, an RMSNorm + 2×2 patch-merger + gelu projector,
and image embeddings merged into a mistral text decoder — engine-served
via the prompt-embeds path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from .config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class PixtralVisionConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    head_dim: int
    image_size: int
    patch_size: int
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "PixtralVisionConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            head_dim=d.get("head_dim", d["hidden_size"] // d["num_attention_heads"]),
            image_size=d["image_size"],
            patch_size=d["patch_size"],
            rope_theta=d.get("rope_theta", 10000.0),
        )


@dataclass(frozen=True)
class Mistral3Config:
    text: ModelConfig
    vision: PixtralVisionConfig
    image_token_id: int
    spatial_merge_size: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Mistral3Config":
        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["MistralForCausalLM"]})
        return cls(
            text=text,
            vision=PixtralVisionConfig.from_hf(d["vision_config"]),
            image_token_id=d.get("image_token_index", 10),
            spatial_merge_size=d.get("spatial_merge_size", 2),
        )


def mistral3_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Mistral3Config, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    text_sd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            text_sd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            text_sd[k] = v
    g = lambda k: jnp.asarray(sd["model.vision_tower." + k], dtype)  # noqa: E731
    layers = []
    for i in range(cfg.vision.num_layers):
        p = f"transformer.layers.{i}."
        layers.append({
            "attn_norm": g(p + "attention_norm.weight"),
            "ffn_norm": g(p + "ffn_norm.weight"),
            "wq": g(p + "attention.q_proj.weight"),
            "wk": g(p + "attention.k_proj.weight"),
            "wv": g(p + "attention.v_proj.weight"),
            "wo": g(p + "attention.o_proj.weight"),
            "gate": g(p + "feed_forward.gate_proj.weight"),
            "up": g(p + "feed_forward.up_proj.weight"),
            "down": g(p + "feed_forward.down_proj.weight"),
        })
    pm = "model.multi_modal_projector."
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": {
            "patch_conv": g("patch_conv.weight"),
            "ln_pre": g("ln_pre.weight"),
            "layers": layers,
        },
        "proj_norm": jnp.asarray(sd[pm + "norm.weight"], dtype),
        "merge_w": jnp.asarray(sd[pm + "patch_merger.merging_layer.weight"], dtype),
        "proj_w1": jnp.asarray(sd[pm + "linear_1.weight"], dtype),
        "proj_w2": jnp.asarray(sd[pm + "linear_2.weight"], dtype),
    }


def _pixtral_rope(cfg: PixtralVisionConfig, positions: np.ndarray):
    """(cos, sin) [T, head_dim] from flat meshgrid ids (HF
    PixtralRotaryEmbedding: h-coords use even freqs, w-coords odd)."""
    hd = cfg.head_dim
    side = cfg.image_size // cfg.patch_size
    freqs = 1.0 / (
        cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd)
    )
    h = np.arange(side)
    fh = np.outer(h, freqs[::2])
    fw = np.outer(h, freqs[1::2])
    inv = np.concatenate(
        [
            np.repeat(fh[:, None, :], side, axis=1),
            np.repeat(fw[None, :, :], side, axis=0),
        ],
        axis=-1,
    ).reshape(side * side, hd // 2)
    inv = np.concatenate([inv, inv], axis=-1)  # [side², hd]
    emb = inv[positions]
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _rotate_half_apply(x, cos, sin):
    # x [B, T, H, hd]; cos/sin [T, hd] (full-dim, rotate-half pairing)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


def pixtral_vision_forward(
    params: dict,
    cfg: PixtralVisionConfig,
    images: Sequence[jax.Array],  # each [3, H, W] (multiples of patch_size)
) -> jax.Array:
    """→ packed patch features [1, ΣT_i, hidden] (block-diagonal attention
    between images, HF PixtralVisionModel parity)."""
    p = cfg.patch_size
    side = cfg.image_size // p
    wconv = params["patch_conv"].reshape(cfg.hidden_size, -1)
    embeds = []
    positions = []
    spans = []
    for img in images:
        c, hh, ww = img.shape
        nh, nw = hh // p, ww // p
        px = img.reshape(c, nh, p, nw, p).transpose(1, 3, 0, 2, 4)
        patches = px.reshape(nh * nw, c * p * p)
        embeds.append(patches @ wconv.T)
        mesh = np.arange(nh)[:, None] * side + np.arange(nw)[None, :]
        positions.append(mesh.reshape(-1))
        spans.append(nh * nw)
    h = jnp.concatenate(embeds, axis=0)[None]  # [1, T, d]
    h = rms_norm(h, params["ln_pre"], cfg.rms_norm_eps)
    cos, sin = _pixtral_rope(cfg, np.concatenate(positions))

    # block-diagonal mask between images
    t = h.shape[1]
    block_ids = np.repeat(np.arange(len(spans)), spans)
    mask = jnp.asarray(block_ids[:, None] == block_ids[None, :])

    nh_, hd = cfg.num_heads, cfg.head_dim
    for lw in params["layers"]:
        x = rms_norm(h, lw["attn_norm"], cfg.rms_norm_eps)
        q = (x @ lw["wq"].T).reshape(1, t, nh_, hd)
        k = (x @ lw["wk"].T).reshape(1, t, nh_, hd)
        v = (x @ lw["wv"].T).reshape(1, t, nh_, hd)
        q = _rotate_half_apply(q, cos, sin)
        k = _rotate_half_apply(k, cos, sin)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        s = jnp.where(mask[None, None], s, -1e30)
        pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(1, t, -1)
        h = h + attn @ lw["wo"].T
        x = rms_norm(h, lw["ffn_norm"], cfg.rms_norm_eps)
        h = h + (jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)) @ lw["down"].T
    return h


def encode_images(
    weights: dict,
    cfg: Mistral3Config,
    images: Sequence[jax.Array],  # each [3, H, W]
) -> jax.Array:
    """→ merged+projected image tokens [1, Σ(T_i/merge²), H_text]."""
    feats = pixtral_vision_forward(weights["vision"], cfg.vision, images)[0]
    feats = rms_norm(feats, weights["proj_norm"], cfg.vision.rms_norm_eps)
    # 2x2 spatial merge per image (unfold order: channel-major like torch)
    m = cfg.spatial_merge_size
    p = cfg.vision.patch_size
    out = []
    off = 0
    d = feats.shape[-1]
    for img in images:
        nh, nw = img.shape[1] // p, img.shape[2] // p
        grid = feats[off : off + nh * nw].reshape(nh, nw, d)
        g = grid.reshape(nh // m, m, nw // m, m, d)
        # torch unfold: [d*m*m, L] with channel-major (d slowest? kernel dims
        # fastest) — F.unfold gives blocks ordered (c, kh, kw)
        g = g.transpose(0, 2, 4, 1, 3).reshape(-1, d * m * m)
        out.append(g)
        off += nh * nw
    merged = jnp.concatenate(out, axis=0) @ weights["merge_w"].T
    h = jax.nn.gelu(merged @ weights["proj_w1"].T, approximate=False)
    return (h @ weights["proj_w2"].T)[None]


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Mistral3Config,
    prompt_ids: list[int],
    images,  # list of [3, H, W] arrays or None
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving."""
    from ..multimodal import prepare_vlm_prompt

    def encode(imgs):
        return encode_images(weights, cfg, [jnp.asarray(i) for i in imgs])

    return prepare_vlm_prompt(
        prompt_ids,
        images if images else None,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="mistral3",
        compute_dtype=compute_dtype,
    )
