"""Mllama (Llama 3.2 Vision) — the analog of the reference's
`mistralrs-core/src/vision_models/mllama/{mod,text}.rs`.

A llama-style self-attention decoder with CROSS-attention layers
interleaved at `cross_attention_layers`: queries come from the text
stream (per-head q-norm), keys/values from the vision tower's
cross-attention states (per-head k-norm), with tanh-gated residuals.
Cross K/V is computed once at prefill and reused every decode step; text
rows before any image are masked out of the cross branch entirely
(`full_text_row_masked_out_mask` semantics, HF parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin, rope_frequencies
from ..vision.mllama import (
    MllamaVisionConfig,
    mllama_vision_forward,
    mllama_vision_params,
)
from .config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class MllamaConfig:
    text: ModelConfig
    vision: MllamaVisionConfig
    cross_attention_layers: tuple[int, ...]
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "MllamaConfig":
        tc = dict(d["text_config"])
        text = config_from_hf(tc | {"architectures": ["LlamaForCausalLM"]})
        return cls(
            text=text,
            vision=MllamaVisionConfig.from_hf(d["vision_config"]),
            cross_attention_layers=tuple(tc["cross_attention_layers"]),
            image_token_id=d.get("image_token_index", 128256),
        )


def mllama_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: MllamaConfig, dtype=jnp.float32,
) -> dict:
    # HF layouts: new-style "model.language_model." / old "language_model.model."
    def sub(prefix_opts):
        for p in prefix_opts:
            picked = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            if picked:
                return picked
        return {}

    text_sd = sub(["model.language_model.", "language_model.model."])
    vis_sd = sub(["model.vision_model.", "vision_model."])
    proj_w = (
        sd.get("model.multi_modal_projector.weight")
        if "model.multi_modal_projector.weight" in sd
        else sd.get("multi_modal_projector.weight")
    )
    proj_b = (
        sd.get("model.multi_modal_projector.bias")
        if "model.multi_modal_projector.bias" in sd
        else sd.get("multi_modal_projector.bias")
    )
    g = lambda k: jnp.asarray(text_sd[k], dtype)  # noqa: E731
    layers = []
    cross = set(cfg.cross_attention_layers)
    for i in range(cfg.text.num_layers):
        p = f"layers.{i}."
        lw = {
            "attn_norm": g(p + "input_layernorm.weight"),
            "ffn_norm": g(p + "post_attention_layernorm.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
        }
        if i in cross:
            lw.update({
                "xq": g(p + "cross_attn.q_proj.weight"),
                "xk": g(p + "cross_attn.k_proj.weight"),
                "xv": g(p + "cross_attn.v_proj.weight"),
                "xo": g(p + "cross_attn.o_proj.weight"),
                "q_norm": g(p + "cross_attn.q_norm.weight"),
                "k_norm": g(p + "cross_attn.k_norm.weight"),
                "attn_gate": g(p + "cross_attn_attn_gate"),
                "mlp_gate": g(p + "cross_attn_mlp_gate"),
            })
        else:
            lw.update({
                "wq": g(p + "self_attn.q_proj.weight"),
                "wk": g(p + "self_attn.k_proj.weight"),
                "wv": g(p + "self_attn.v_proj.weight"),
                "wo": g(p + "self_attn.o_proj.weight"),
            })
        layers.append(lw)
    lm_head = sd.get("lm_head.weight")
    return {
        "embed": g("embed_tokens.weight"),  # [vocab + 8, H]
        "layers": layers,
        "final_norm": g("norm.weight"),
        "lm_head": (
            jnp.asarray(lm_head, dtype) if lm_head is not None
            else g("embed_tokens.weight")[: cfg.text.vocab_size]
        ),
        "vision": mllama_vision_params(vis_sd, cfg.vision, dtype=dtype),
        "proj_w": jnp.asarray(proj_w, dtype),
        "proj_b": jnp.asarray(proj_b, dtype),
    }


@dataclass
class MllamaCache:
    """Per-self-layer KV rings + per-cross-layer vision K/V (computed at
    prefill, constant across decode — the reference's CrossAttention cache,
    `kv_cache/single_cache.rs` normal + `text.rs` cross reuse)."""

    k: list  # n_self × [B, cap, n_kv, hd]
    v: list
    xk: list  # n_cross × [B, S_v, n_kv, hd] (None until prefill)
    xv: list

    @classmethod
    def create(cls, cfg: MllamaConfig, b: int, capacity: int, dtype=jnp.float32):
        t = cfg.text
        n_self = t.num_layers - len(cfg.cross_attention_layers)
        shape = (b, capacity, t.num_kv_heads, t.head_dim)
        return cls(
            k=[jnp.zeros(shape, dtype) for _ in range(n_self)],
            v=[jnp.zeros(shape, dtype) for _ in range(n_self)],
            xk=[None] * len(cfg.cross_attention_layers),
            xv=[None] * len(cfg.cross_attention_layers),
        )


def prepare_cross_attention_mask(
    cross_attention_mask: np.ndarray,  # [B, T, n_img, n_tiles] 0/1
    num_vision_tokens: int,
) -> tuple[np.ndarray, np.ndarray]:
    """HF `_prepare_cross_attention_mask`: → (additive bias
    [B, 1, T, n_img*n_tiles*num_vision_tokens], full-row keep mask
    [B, 1, T, 1])."""
    b, t = cross_attention_mask.shape[:2]
    m = np.repeat(cross_attention_mask, num_vision_tokens, axis=3)
    m = m.reshape(b, t, -1)[:, None].astype(np.float32)
    bias = np.where(m > 0, 0.0, -1e30).astype(np.float32)
    full_row = (bias != -1e30).any(axis=-1).astype(np.float32)[..., None]
    bias = bias * full_row  # fully-masked rows become all-zero (HF quirk)
    return bias, full_row


def mllama_forward(
    weights: dict,
    cfg: MllamaConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: MllamaCache,
    kv_start: jax.Array,  # [B]
    cross_states: Optional[jax.Array] = None,  # [B, S_v, H] (prefill w/ image)
    cross_bias: Optional[jax.Array] = None,  # [B, 1, T, S_v]
    full_row: Optional[jax.Array] = None,  # [B, 1, T, 1]
    *,
    compute_dtype=jnp.float32,
    logits_last_only: bool = False,
) -> tuple[jax.Array, MllamaCache]:
    t_cfg = cfg.text
    b, t = input_ids.shape
    nh, nkv, hd = t_cfg.num_heads, t_cfg.num_kv_heads, t_cfg.head_dim
    h = jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    inv = rope_frequencies(hd, t_cfg.rope_theta, t_cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv)

    ks, vs = list(cache.k), list(cache.v)
    xks, xvs = list(cache.xk), list(cache.xv)
    cross = set(cfg.cross_attention_layers)
    ai = ci = 0
    for li, lw in enumerate(weights["layers"]):
        x = rms_norm(h, lw["attn_norm"], t_cfg.rms_norm_eps)
        if li in cross:
            if cross_states is None and xks[ci] is None:
                # text-only: HF skips cross layers entirely when no image
                # has been seen (cross states absent)
                ci += 1
                continue
            q = (x @ lw["xq"].T).reshape(b, t, nh, hd)
            q = rms_norm(q, lw["q_norm"], t_cfg.rms_norm_eps)
            if cross_states is not None:
                s_v = cross_states.shape[1]
                xk = (cross_states @ lw["xk"].T).reshape(b, s_v, nkv, hd)
                xk = rms_norm(xk, lw["k_norm"], t_cfg.rms_norm_eps)
                xv = (cross_states @ lw["xv"].T).reshape(b, s_v, nkv, hd)
                xks[ci], xvs[ci] = xk, xv
            else:
                xk, xv = xks[ci], xvs[ci]
            qf = q.reshape(b, t, nkv, nh // nkv, hd).astype(jnp.float32)
            logits = jnp.einsum(
                "btkgh,bskh->bkgts", qf, xk.astype(jnp.float32)
            ) / jnp.sqrt(hd)
            if cross_bias is not None:
                logits = logits + cross_bias[:, :, None].astype(jnp.float32)
            p = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bkgts,bskh->btkgh", p, xv.astype(jnp.float32))
            attn = attn.reshape(b, t, nh * hd).astype(compute_dtype)
            attn = attn @ lw["xo"].T
            h = h + jnp.tanh(lw["attn_gate"]) * attn
            x = rms_norm(h, lw["ffn_norm"], t_cfg.rms_norm_eps)
            mlp = (
                jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)
            ) @ lw["down"].T
            if full_row is not None:
                mlp = mlp * full_row[:, 0].astype(mlp.dtype)
            h = h + jnp.tanh(lw["mlp_gate"]) * mlp
            ci += 1
            continue
        q = (x @ lw["wq"].T).reshape(b, t, nh, hd)
        k = (x @ lw["wk"].T).reshape(b, t, nkv, hd)
        v = (x @ lw["wv"].T).reshape(b, t, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        def write(buf, new):
            def one(bu, ne, st):
                return jax.lax.dynamic_update_slice(bu, ne, (st, 0, 0))

            return jax.vmap(one)(buf, new.astype(buf.dtype), kv_start)

        ks[ai] = write(ks[ai], k)
        vs[ai] = write(vs[ai], v)
        attn = sdpa(
            q, ks[ai].astype(compute_dtype), vs[ai].astype(compute_dtype),
            q_positions=positions, kv_len=kv_start + t,
        )
        attn = attn.reshape(b, t, nh * hd) @ lw["wo"].T
        h = h + attn
        x = rms_norm(h, lw["ffn_norm"], t_cfg.rms_norm_eps)
        h = h + (jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)) @ lw["down"].T
        ai += 1

    h = rms_norm(h, weights["final_norm"], t_cfg.rms_norm_eps)
    if logits_last_only:
        h = h[:, -1:]
    logits = (h @ weights["lm_head"].T).astype(jnp.float32)
    return logits, MllamaCache(k=ks, v=vs, xk=xks, xv=xvs)


def encode_images(
    weights: dict,
    cfg: MllamaConfig,
    pixel_values: jax.Array,  # [B, n_img, n_tiles, 3, H, W]
    aspect_ratio_ids: jax.Array,
    aspect_ratio_mask: jax.Array,
) -> jax.Array:
    """→ projected cross-attention states [B, n_img*n_tiles*num_patches, H]."""
    feats = mllama_vision_forward(
        weights["vision"], cfg.vision, pixel_values, aspect_ratio_ids,
        aspect_ratio_mask,
    )
    proj = feats @ weights["proj_w"].T + weights["proj_b"]
    b = proj.shape[0]
    return proj.reshape(b, -1, proj.shape[-1])
