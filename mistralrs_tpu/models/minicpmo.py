"""MiniCPM-O — the analog of the reference's
`mistralrs-core/src/vision_models/minicpmo/`: a SigLIP tower feeding a
single-layer cross-attention RESAMPLER (learned queries attend over
kv-projected vision features + 2D sin-cos position embeddings, torch
nn.MultiheadAttention semantics) that compresses each image to `query_num`
tokens merged into a qwen2 decoder. No transformers class exists for this
arch in the image; the resampler is parity-tested against
torch.nn.MultiheadAttention directly (resampler.rs:124-211).
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
class MiniCpmOConfig:
    text: ModelConfig
    vision: VisionConfig
    query_num: int
    num_heads: int  # resampler heads (= text hidden / 128 in checkpoints)
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "MiniCpmOConfig":
        tc = dict(d.get("text_config", d))
        text = config_from_hf(tc | {"architectures": ["Qwen2ForCausalLM"]})
        return cls(
            text=text,
            vision=VisionConfig.from_hf(d["vision_config"], family="siglip"),
            query_num=d.get("query_num", 64),
            num_heads=d.get("resampler_num_heads",
                            max(1, tc["hidden_size"] // 128)),
            image_token_id=d.get("image_token_id", 128244),
        )


def minicpmo_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: MiniCpmOConfig, dtype=jnp.float32,
    **text_kwargs,
) -> dict:
    from .hf_loader import weights_from_state_dict

    text_sd = {
        k[len("llm."):]: v for k, v in sd.items() if k.startswith("llm.")
    }
    # vpm.* is a SiglipVisionModel subtree (no vision_model. prefix)
    vis_sd = {
        "vision_model." + k[len("vpm."):]: v
        for k, v in sd.items() if k.startswith("vpm.")
    }
    g = lambda k: jnp.asarray(sd["resampler." + k], jnp.float32)  # noqa: E731
    res = {
        "query": g("query"),
        "ln_q_w": g("ln_q.weight"), "ln_q_b": g("ln_q.bias"),
        "ln_kv_w": g("ln_kv.weight"), "ln_kv_b": g("ln_kv.bias"),
        "ln_post_w": g("ln_post.weight"), "ln_post_b": g("ln_post.bias"),
        "in_proj_w": g("attn.in_proj_weight"),
        "in_proj_b": g("attn.in_proj_bias"),
        "out_proj_w": g("attn.out_proj.weight"),
        "out_proj_b": g("attn.out_proj.bias"),
        "proj": g("proj"),
    }
    if "resampler.kv_proj.weight" in sd:
        res["kv_proj"] = g("kv_proj.weight")
    return {
        "text": weights_from_state_dict(text_sd, cfg.text, dtype=dtype,
                                        **text_kwargs),
        "vision": vision_weights_from_hf(vis_sd, "", cfg.vision,
                                         dtype=jnp.float32),
        "resampler": res,
    }


def _ln(x, w, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b


def sincos_2d_pos_embed(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h*w, embed_dim] — resampler.rs get_2d_sincos_pos_embed: the h and w
    coordinate streams each fill half the channels with [sin, cos] halves."""
    def one(dim, pos):  # pos [h, w]
        inv = 1.0 / (10_000.0 ** (np.arange(0, dim, 2) / dim))
        out = pos.reshape(-1, 1) * inv[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    gh, gw = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    emb = np.concatenate(
        [one(embed_dim // 2, gh.astype(np.float32)),
         one(embed_dim // 2, gw.astype(np.float32))], axis=-1
    )
    return emb.astype(np.float32)


def resample(weights: dict, cfg: MiniCpmOConfig, feats: jax.Array,
             tgt_size: tuple[int, int]) -> jax.Array:
    """[B, S, D_vis] tower features → [B, query_num, H_text] (torch
    nn.MultiheadAttention semantics: fused in_proj, per-head softmax)."""
    r = weights["resampler"]
    b, s, _ = feats.shape
    d = r["query"].shape[-1]
    x = feats
    if "kv_proj" in r:
        x = x @ r["kv_proj"].T
    x = _ln(x, r["ln_kv_w"], r["ln_kv_b"])
    pos = jnp.asarray(sincos_2d_pos_embed(d, *tgt_size), x.dtype)
    k_in = x + pos[None]
    q_in = _ln(r["query"], r["ln_q_w"], r["ln_q_b"])[None].repeat(b, axis=0)

    wq, wk, wv = jnp.split(r["in_proj_w"], 3, axis=0)
    bq, bk, bv = jnp.split(r["in_proj_b"], 3, axis=0)
    nh = cfg.num_heads
    hd = d // nh
    q = (q_in @ wq.T + bq).reshape(b, -1, nh, hd)
    k = (k_in @ wk.T + bk).reshape(b, s, nh, hd)
    v = (x @ wv.T + bv).reshape(b, s, nh, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, -1, d)
    out = out @ r["out_proj_w"].T + r["out_proj_b"]
    out = _ln(out, r["ln_post_w"], r["ln_post_b"])
    return out @ r["proj"]


def encode_images(
    weights: dict, cfg: MiniCpmOConfig, pixel_values: jax.Array,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """[N, 3, H, W] (full-size square path) → [N, query_num, H_text]."""
    feats = vision_tower_forward(
        weights["vision"], cfg.vision, pixel_values,
        feature_layer=-1, compute_dtype=compute_dtype,
    )
    side = cfg.vision.image_size // cfg.vision.patch_size
    return resample(weights, cfg, feats, (side, side))


def prepare_multimodal_prompt(
    weights: dict,
    cfg: MiniCpmOConfig,
    prompt_ids: list[int],
    pixel_values,
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
            weights, cfg, jnp.asarray(pv), compute_dtype=compute_dtype
        ),
        encoder_cache=encoder_cache,
        cache_namespace="minicpmo",
        compute_dtype=compute_dtype,
    )
