"""Gemma 4 MTP (multi-token prediction) draft heads.

TPU-native implementation of the reference's Gemma 4 assistant/MTP runtime
model (`mistralrs-core/src/vision_models/gemma4/mtp.rs:368-1133`),
reference-spec protocol. The MTP draft is a mini Gemma-4 decoder that
self-drafts future tokens for speculative decoding WITHOUT its own KV
cache:

* Each MTP layer is **query-only**: it has q/o projections but no k/v —
  keys and values come from the TARGET model's paged KV cache at a DONOR
  layer (the last non-shared target layer of the same type, mtp.rs:500).
* A step consumes ``[input_embed ‖ target_hidden]`` (both in backbone
  hidden size) through ``pre_projection``, runs the mini decoder, then
  ``post_projection`` maps back to backbone size for the next step
  (mtp.rs:476-497).
* Logits come from a **centroid-sparse masked embedding** (mtp.rs:779):
  top-k centroid clusters select a vocab subset whose lm-head rows are
  scored; everything else is masked at (min − 1).

The step attends over the target's paged pools via the gather path — MTP
steps are single-token, so the gather is one block-table read per donor
plane.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gemma4 import Gemma4Config, _proportional_rope, _rope_half


@dataclass(frozen=True)
class Gemma4MtpConfig:
    text: Gemma4Config  # the mini decoder's geometry (mtp.rs text_config)
    backbone_hidden_size: int
    num_centroids: int
    centroid_top_k: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any],
                backbone_hidden_size: int) -> "Gemma4MtpConfig":
        return cls(
            text=Gemma4Config.from_hf(d["text_config"]),
            backbone_hidden_size=backbone_hidden_size,
            num_centroids=d.get("num_centroids", 64),
            centroid_top_k=d.get("centroid_intermediate_top_k", 4),
        )


def donor_indices(target: Gemma4Config, mtp_text: Gemma4Config) -> list[int]:
    """MTP layer i borrows KV from the LAST non-shared target layer of the
    same type (mtp.rs:500-519)."""
    first = target.first_shared_layer if target.num_kv_shared_layers > 0 \
        else target.num_layers
    head = list(target.layer_types[:first])
    out = []
    for lt in mtp_text.layer_types:
        if lt not in head:
            raise ValueError(f"no non-shared donor layer of type {lt!r}")
        out.append(len(head) - 1 - head[::-1].index(lt))
    return out


def _rms(x, w=None, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if w is not None:
        n = n * w.astype(jnp.float32)  # plain weight (Gemma4MtpRmsNorm)
    return n.astype(x.dtype)


def masked_embedding_logits(weights: dict, h: jax.Array,
                            lm_head: jax.Array, num_centroids: int,
                            top_k: int):
    """(token [B], logits [B, V]) — centroid-sparse head (mtp.rs:812-851):
    non-selected vocab entries sit at (min logit − 1)."""
    b, hid = h.shape
    v = lm_head.shape[0]
    per = v // num_centroids
    cl = h.astype(jnp.float32) @ weights["centroids"].astype(jnp.float32).T
    _, top_c = jax.lax.top_k(cl, top_k)  # [B, top_k]
    clusters = weights["token_ordering"].reshape(num_centroids, per)
    selected = clusters[top_c].reshape(b, top_k * per)  # [B, S] token ids
    rows = lm_head[selected].astype(jnp.float32)  # [B, S, hid]
    logits = jnp.einsum("bh,bsh->bs", h.astype(jnp.float32), rows)
    mask_val = jnp.min(logits) - 1.0
    amax = jnp.argmax(logits, axis=-1)
    token = jnp.take_along_axis(selected, amax[:, None], axis=1)[:, 0]
    full = jnp.full((b, v), mask_val, jnp.float32)
    full = full.at[jnp.arange(b)[:, None], selected].set(logits)
    return token.astype(jnp.int32), full


def gemma4_mtp_step(
    weights: dict,
    cfg: Gemma4MtpConfig,
    target_cfg: Gemma4Config,
    input_embed: jax.Array,  # [B, H_backbone] embedding of the last token
    target_hidden: jax.Array,  # [B, H_backbone] backbone hidden state
    positions: jax.Array,  # [B] absolute position of the drafted token
    target_cache: dict,  # the TARGET's paged pools (models/gemma4.py)
    block_tables: jax.Array,  # [B, W]
    kv_lens: jax.Array,  # [B] valid target KV length
    *,
    block_size: int,
):
    """One MTP draft step → (token [B], logits [B, V], next_backbone [B, Hb]).
    The mini decoder queries the target's paged KV planes at the donor
    layers (mtp.rs Gemma4MtpStepCache::Paged)."""
    from ..kv.paged import gather_kv
    from ..ops.attention import sdpa
    from .llama import ACTIVATIONS

    tc = cfg.text
    eps = tc.rms_norm_eps
    act = ACTIVATIONS[tc.hidden_act]
    donors = donor_indices(target_cfg, tc)
    planes, _ = target_cfg.kv_plan()

    h = jnp.concatenate([input_embed, target_hidden], axis=-1)
    h = (h @ weights["pre_projection"].T)[:, None]  # [B, 1, H]
    b = h.shape[0]
    pos_bt = positions[:, None]

    for li, lw in enumerate(weights["layers"]):
        lt = tc.layer_types[li]
        sliding = lt == "sliding_attention"
        hd = tc.head_dim if sliding else tc.global_head_dim
        nh = tc.num_heads
        res = h
        x = _rms(h, lw["input_norm"], eps)
        q = (x @ lw["wq"].T).reshape(b, 1, nh, hd)
        q = _rms(q, lw["q_norm"], eps)
        # rope must match the TARGET's geometry — the donor keys were
        # roped by the target forward (models/gemma4.py:417-427)
        if sliding:
            cos, sin = _proportional_rope(
                pos_bt, hd, hd // 2, target_cfg.rope_local_theta)
        else:
            rot = int(hd * target_cfg.partial_rotary_factor / 2.0)
            cos, sin = _proportional_rope(pos_bt, hd, rot,
                                          target_cfg.rope_theta)
        q = _rope_half(q, cos, sin)
        # donor KV from the TARGET pools
        donor = donors[li]
        plane = planes[donor]
        kp = target_cache["k_s" if sliding else "k_f"][plane]
        vp = target_cache["v_s" if sliding else "v_f"][plane]
        kk, vv = gather_kv(kp, vp, block_tables, block_size,
                           dtype=jnp.float32)
        attn = sdpa(
            q.astype(jnp.float32), kk, vv, q_positions=pos_bt,
            kv_len=kv_lens, scale=1.0,  # SdpaParams softmax_scale 1.0
            sliding_window=(
                target_cfg.sliding_window if sliding else None),
        )
        attn = attn.reshape(b, 1, nh * hd).astype(h.dtype)
        attn = attn @ lw["wo"].T
        attn = _rms(attn, lw["post_attn_norm"], eps)
        h = attn + res
        res = h
        m = _rms(h, lw["pre_ffn_norm"], eps)
        m = (act(m @ lw["gate"].T) * (m @ lw["up"].T)) @ lw["down"].T
        m = _rms(m, lw["post_ffn_norm"], eps)
        h = m + res
        if lw.get("layer_scalar") is not None:
            h = h * lw["layer_scalar"]

    draft_h = _rms(h[:, 0], weights["norm"], eps)
    backbone = draft_h @ weights["post_projection"].T
    token, logits = masked_embedding_logits(
        weights["masked"], draft_h, weights["lm_head"],
        cfg.num_centroids, cfg.centroid_top_k)
    return token, logits, backbone


def gemma4_mtp_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Gemma4MtpConfig,
    dtype=jnp.float32, prefix: str = "mtp.",
) -> dict:
    def g(name, optional=False):
        arr = sd.get(prefix + name)
        if arr is None:
            if optional:
                return None
            raise KeyError(prefix + name)
        return jnp.asarray(np.asarray(arr, np.float32), dtype)

    tc = cfg.text
    w = {
        "pre_projection": g("pre_projection.weight"),
        "post_projection": g("post_projection.weight"),
        "lm_head": g("model.embed_tokens.weight"),
        "norm": g("model.norm.weight"),
        "masked": {
            "centroids": g("masked_embedding.centroids.weight"),
            "token_ordering": jnp.asarray(
                np.asarray(sd[prefix + "masked_embedding.token_ordering"],
                           np.int64), jnp.int32),
        },
        "layers": [],
    }
    for i in range(tc.num_layers):
        p = f"model.layers.{i}."
        w["layers"].append({
            "input_norm": g(p + "input_layernorm.weight"),
            "post_attn_norm": g(p + "post_attention_layernorm.weight"),
            "pre_ffn_norm": g(p + "pre_feedforward_layernorm.weight"),
            "post_ffn_norm": g(p + "post_feedforward_layernorm.weight"),
            "wq": g(p + "self_attn.q_proj.weight"),
            "wo": g(p + "self_attn.o_proj.weight"),
            "q_norm": g(p + "self_attn.q_norm.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
            "layer_scalar": g(p + "layer_scalar", optional=True),
        })
    return w
