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

    # engine-facing passthroughs (Engine reads these off any adapter cfg)
    @property
    def arch(self) -> str:
        return "mllama"

    @property
    def vocab_size(self) -> int:
        return self.text.vocab_size

    @property
    def hidden_size(self) -> int:
        return self.text.hidden_size

    @property
    def max_position_embeddings(self) -> int:
        return self.text.max_position_embeddings

    @property
    def eos_token_ids(self):
        return self.text.eos_token_ids

    @property
    def embedding_multiplier(self):
        return None


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

# ---------------------------------------------------------------------------
# engine serving (paged self-attention + per-slot cross K/V pools)
# ---------------------------------------------------------------------------


def make_paged_cache(
    cfg: MllamaConfig, num_blocks: int, block_size: int, n_slots: int,
    dtype=jnp.float32,
) -> dict:
    """Pools for engine serving: paged KV for self-attention layers (+1
    trash slot) and per-decode-slot cross K/V computed once at admission
    (+1 trash row) — the hybrid-cache analog for cross-attention
    (`mistralrs-core/src/kv_cache/hybrid_cache.rs`)."""
    t = cfg.text
    n_cross = len(cfg.cross_attention_layers)
    n_self = t.num_layers - n_cross
    s_total = num_blocks * block_size + 1
    s_v = cfg.vision.max_num_tiles * cfg.vision.num_patches
    s_v = -(-s_v // 8) * 8  # sublane alignment
    return {
        "k": jnp.zeros((n_self, s_total, t.num_kv_heads, t.head_dim), dtype),
        "v": jnp.zeros((n_self, s_total, t.num_kv_heads, t.head_dim), dtype),
        "xk": jnp.zeros(
            (n_cross, n_slots + 1, s_v, t.num_kv_heads, t.head_dim), dtype
        ),
        "xv": jnp.zeros(
            (n_cross, n_slots + 1, s_v, t.num_kv_heads, t.head_dim), dtype
        ),
        "xlen": jnp.zeros((n_slots + 1,), jnp.int32),  # valid vision rows
        "xstart": jnp.zeros((n_slots + 1,), jnp.int32),  # first attending pos
    }


def admit_cross_states(
    weights: dict,
    cfg: MllamaConfig,
    cache: dict,
    slot: int,
    cross_states,  # [S_v, H] (unpadded valid rows first)
    img_start: int,
) -> dict:
    """Install a sequence's cross K/V into its decode slot (once per
    admission; recompute-preemption re-installs at the new slot)."""
    t = cfg.text
    s_v_pool = cache["xk"].shape[2]
    cs = jnp.asarray(cross_states)
    n_valid = cs.shape[0]
    if n_valid < s_v_pool:
        cs = jnp.pad(cs, ((0, s_v_pool - n_valid), (0, 0)))
    cross = sorted(cfg.cross_attention_layers)
    for ci, li in enumerate(cross):
        lw = weights["layers"][li]
        xk = (cs @ lw["xk"].T).reshape(s_v_pool, t.num_kv_heads, t.head_dim)
        xk = rms_norm(xk, lw["k_norm"], t.rms_norm_eps)
        xv = (cs @ lw["xv"].T).reshape(s_v_pool, t.num_kv_heads, t.head_dim)
        cache = dict(cache)
        cache["xk"] = cache["xk"].at[ci, slot].set(xk.astype(cache["xk"].dtype))
        cache["xv"] = cache["xv"].at[ci, slot].set(xv.astype(cache["xv"].dtype))
    cache["xlen"] = cache["xlen"].at[slot].set(n_valid)
    cache["xstart"] = cache["xstart"].at[slot].set(img_start)
    return cache


def release_cross_states(cache: dict, slot: int) -> dict:
    cache = dict(cache)
    cache["xlen"] = cache["xlen"].at[slot].set(0)
    cache["xstart"] = cache["xstart"].at[slot].set(0)
    return cache


def mllama_forward_paged(
    weights: dict,
    cfg: MllamaConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,
    block_tables: jax.Array,  # [B, W]
    slot_mapping: jax.Array,  # [B, T] (< 0 → dropped)
    kv_lens: jax.Array,  # [B]
    slot_ids: jax.Array,  # [B] decode slot per row (< 0 → trash)
    *,
    block_size: int,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
) -> tuple[jax.Array, dict]:
    """Engine-servable mllama step. Self layers use the paged pools; cross
    layers read the per-slot vision K/V installed at admission. Rows whose
    slot has no image skip cross layers entirely; rows before the image
    position follow HF's full-row masking semantics."""
    from ..ops.attention import sdpa as _sdpa

    t_cfg = cfg.text
    b, t = input_ids.shape
    nh, nkv, hd = t_cfg.num_heads, t_cfg.num_kv_heads, t_cfg.head_dim
    h = jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    inv = rope_frequencies(hd, t_cfg.rope_theta, t_cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv)

    kv_trash = cache["k"].shape[1] - 1
    flat_slots = jnp.where(
        slot_mapping.reshape(b * t) < 0, kv_trash, slot_mapping.reshape(b * t)
    )
    slot_trash = cache["xlen"].shape[0] - 1
    slot_safe = jnp.where(slot_ids < 0, slot_trash, slot_ids)
    bt_safe = jnp.maximum(block_tables, 0)
    gather_slots = (
        bt_safe[:, :, None] * block_size + jnp.arange(block_size)[None, None, :]
    ).reshape(b, -1)

    xlen = cache["xlen"][slot_safe]  # [B]
    xstart = cache["xstart"][slot_safe]
    has_img = xlen > 0
    s_v = cache["xk"].shape[2]
    kv_valid = jnp.arange(s_v)[None, None] < xlen[:, None, None]  # [B,1,S_v]
    full_row = (positions >= xstart[:, None]) & has_img[:, None]  # [B,T]
    # HF quirk: bias rows outside full_row become all-zero (uniform attn);
    # the mlp branch is zeroed and h is gated back below
    bias = jnp.where(kv_valid, 0.0, -1e30) * full_row[:, :, None]  # [B,T,S_v]

    new_cache = dict(cache)
    cross = set(cfg.cross_attention_layers)
    ai = ci = 0
    for li, lw in enumerate(weights["layers"]):
        x = rms_norm(h, lw["attn_norm"], t_cfg.rms_norm_eps)
        if li in cross:
            q = (x @ lw["xq"].T).reshape(b, t, nh, hd)
            q = rms_norm(q, lw["q_norm"], t_cfg.rms_norm_eps)
            xk = new_cache["xk"][ci, slot_safe].astype(compute_dtype)
            xv = new_cache["xv"][ci, slot_safe].astype(compute_dtype)
            qf = q.reshape(b, t, nkv, nh // nkv, hd).astype(jnp.float32)
            logits = jnp.einsum(
                "btkgh,bskh->bkgts", qf, xk.astype(jnp.float32)
            ) / jnp.sqrt(hd)
            logits = logits + bias[:, None, None].astype(jnp.float32)
            p = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bkgts,bskh->btkgh", p, xv.astype(jnp.float32))
            attn = attn.reshape(b, t, nh * hd).astype(compute_dtype)
            h2 = h + jnp.tanh(lw["attn_gate"]) * (attn @ lw["xo"].T)
            x2 = rms_norm(h2, lw["ffn_norm"], t_cfg.rms_norm_eps)
            mlp = (
                jax.nn.silu(x2 @ lw["gate"].T) * (x2 @ lw["up"].T)
            ) @ lw["down"].T
            mlp = mlp * full_row[..., None].astype(mlp.dtype)
            h2 = h2 + jnp.tanh(lw["mlp_gate"]) * mlp
            h = jnp.where(has_img[:, None, None], h2, h)
            ci += 1
            continue
        q = (x @ lw["wq"].T).reshape(b, t, nh, hd)
        k = (x @ lw["wk"].T).reshape(b, t, nkv, hd)
        v = (x @ lw["wv"].T).reshape(b, t, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kp = new_cache["k"].at[ai, flat_slots].set(
            k.reshape(b * t, nkv, hd).astype(new_cache["k"].dtype)
        )
        vp = new_cache["v"].at[ai, flat_slots].set(
            v.reshape(b * t, nkv, hd).astype(new_cache["v"].dtype)
        )
        new_cache["k"], new_cache["v"] = kp, vp
        kk = kp[ai][gather_slots].astype(compute_dtype)
        vv = vp[ai][gather_slots].astype(compute_dtype)
        attn = _sdpa(q, kk, vv, q_positions=positions, kv_len=kv_lens)
        h = h + attn.reshape(b, t, nh * hd) @ lw["wo"].T
        x = rms_norm(h, lw["ffn_norm"], t_cfg.rms_norm_eps)
        h = h + (jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)) @ lw["down"].T
        ai += 1

    h = rms_norm(h, weights["final_norm"], t_cfg.rms_norm_eps)
    if logits_last_only:
        if last_indices is not None:
            h = jnp.take_along_axis(
                h, last_indices.astype(jnp.int32)[:, None, None], axis=1
            )
        else:
            h = h[:, -1:]
    logits = (h @ weights["lm_head"].T).astype(jnp.float32)
    return logits, new_cache
