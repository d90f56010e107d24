"""LFM2 (Liquid) hybrid conv/attention causal LM — the analog of the
reference's LFM2 support (`mistralrs-core/src/models/lfm2.rs`, hybrid
cache `kv_cache/` HybridCache).

Architecture (verified against HF `Lfm2ForCausalLM`, tests/test_lfm2.py):
- interleaved layer types: gated short-conv layers and GQA attention layers
  (``layer_types`` config), each ``operator_norm → mixer → +residual`` then
  ``ffn_norm → SwiGLU MLP → +residual``
- conv mixer: ``B, C, x = in_proj(h)``; depthwise causal conv (kernel
  ``L_cache``) over ``B*x``; ``out_proj(C * conv)``
- attention: per-head RMSNorm on q/k before RoPE (full head dim)

The layer stack is heterogeneous, so the forward is an unrolled Python loop
over per-layer weight dicts (LFM2 models are small; XLA still fuses each
layer body). The hybrid cache pairs a contiguous KV cache for attention
layers with a rolling conv state ``[B, H, L_cache]`` per conv layer.
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


@dataclass(frozen=True)
class Lfm2Config:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    layer_types: tuple[str, ...]  # "conv" | "full_attention"
    conv_l_cache: int = 3
    conv_bias: bool = False
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 128000
    tie_word_embeddings: bool = True
    eos_token_ids: tuple[int, ...] = ()

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Lfm2Config":
        n_heads = d["num_attention_heads"]
        eos = d.get("eos_token_id")
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d.get("block_ff_dim") or d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=d.get("num_key_value_heads", n_heads),
            head_dim=d.get("head_dim") or d["hidden_size"] // n_heads,
            layer_types=tuple(d["layer_types"]),
            conv_l_cache=d.get("conv_L_cache", 3),
            conv_bias=d.get("conv_bias", False),
            norm_eps=d.get("norm_eps", d.get("rms_norm_eps", 1e-5)),
            rope_theta=d.get("rope_theta", 1000000.0),
            max_position_embeddings=d.get("max_position_embeddings", 128000),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            eos_token_ids=(
                tuple(eos) if isinstance(eos, (list, tuple))
                else ((eos,) if eos is not None else ())
            ),
        )


@dataclass
class Lfm2Cache:
    """k/v: [L_attn, B, S, n_kv, hd]; conv: [L_conv, B, H, conv_l_cache]."""

    k: jax.Array
    v: jax.Array
    conv: jax.Array

    @classmethod
    def create(cls, cfg: Lfm2Config, batch: int, capacity: int, dtype=jnp.float32):
        n_attn = sum(t == "full_attention" for t in cfg.layer_types)
        n_conv = cfg.num_layers - n_attn
        return cls(
            k=jnp.zeros(
                (n_attn, batch, capacity, cfg.num_kv_heads, cfg.head_dim), dtype
            ),
            v=jnp.zeros(
                (n_attn, batch, capacity, cfg.num_kv_heads, cfg.head_dim), dtype
            ),
            conv=jnp.zeros(
                (n_conv, batch, cfg.hidden_size, cfg.conv_l_cache), dtype
            ),
        )


def _causal_depthwise_conv(bx: jax.Array, w: jax.Array, bias) -> jax.Array:
    """bx [B, T, H], w [H, L] → causal conv out [B, T, H]
    (out[t] = Σ_j w[:, j] · bx[t - (L-1) + j])."""
    L = w.shape[-1]
    padded = jnp.pad(bx, ((0, 0), (L - 1, 0), (0, 0)))
    out = jnp.zeros_like(bx)
    t = bx.shape[1]
    for j in range(L):
        out = out + padded[:, j : j + t, :] * w[:, j]
    if bias is not None:
        out = out + bias
    return out


def _conv_mixer(cfg: Lfm2Config, lw: dict, x, conv_state, decode: bool):
    """Returns (out [B, T, H], new conv_state [B, H, L])."""
    bcx = x @ lw["in_proj"].T
    if lw.get("in_proj_bias") is not None:
        bcx = bcx + lw["in_proj_bias"]
    h = cfg.hidden_size
    b_g, c_g, xin = bcx[..., :h], bcx[..., h : 2 * h], bcx[..., 2 * h :]
    bx = b_g * xin  # [B, T, H]
    w = lw["conv_w"]  # [H, L]
    if decode:  # single token: roll state left, append, weighted sum
        state = jnp.concatenate(
            [conv_state[..., 1:], jnp.swapaxes(bx, 1, 2)], axis=-1
        )
        conv_out = jnp.sum(state * w[None], axis=-1)[:, None, :]
        if lw.get("conv_b") is not None:
            conv_out = conv_out + lw["conv_b"]
        new_state = state
    else:  # prefill from scratch: full causal conv; state = last L tokens
        conv_out = _causal_depthwise_conv(bx, w, lw.get("conv_b"))
        L = cfg.conv_l_cache
        padded = jnp.pad(bx, ((0, 0), (L, 0), (0, 0)))[:, -L:, :]
        new_state = jnp.swapaxes(padded, 1, 2)
    y = c_g * conv_out
    out = y @ lw["out_proj"].T
    if lw.get("out_proj_bias") is not None:
        out = out + lw["out_proj_bias"]
    return out, new_state


def _attn_mixer(cfg: Lfm2Config, lw: dict, x, k_cache, v_cache, cos, sin,
                positions, kv_start):
    b, t, _ = x.shape
    q = (x @ lw["wq"].T).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = (x @ lw["wk"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = (x @ lw["wv"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    q = rms_norm(q, lw["q_norm"], cfg.norm_eps)
    k = rms_norm(k, lw["k_norm"], cfg.norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    def write(cache, new):
        def one(row, new_row, start):
            return jax.lax.dynamic_update_slice(row, new_row, (start, 0, 0))

        return jax.vmap(one)(cache, new, kv_start)

    k_cache = write(k_cache, k)
    v_cache = write(v_cache, v)
    attn = sdpa(
        q, k_cache, v_cache, q_positions=positions, kv_len=kv_start + t
    )
    attn = attn.reshape(b, t, cfg.num_heads * cfg.head_dim)
    return attn @ lw["wo"].T, k_cache, v_cache


def lfm2_forward(
    weights: dict,
    cfg: Lfm2Config,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: Lfm2Cache,
    kv_start: jax.Array,  # [B]
    *,
    decode: bool = False,  # True → single-token step using conv state
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, Lfm2Cache]:
    h = jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    inv = rope_frequencies(cfg.head_dim, cfg.rope_theta, None)
    cos, sin = rope_cos_sin(positions, inv)

    ks, vs, convs = [], [], []
    ai = ci = 0
    for li, lt in enumerate(cfg.layer_types):
        lw = weights["layers"][li]
        x = rms_norm(h, lw["operator_norm"], cfg.norm_eps)
        if lt == "full_attention":
            out, nk, nv = _attn_mixer(
                cfg, lw, x, cache.k[ai], cache.v[ai], cos, sin, positions,
                kv_start,
            )
            ks.append(nk)
            vs.append(nv)
            ai += 1
        else:
            out, nstate = _conv_mixer(cfg, lw, x, cache.conv[ci], decode)
            convs.append(nstate)
            ci += 1
        h = h + out
        x = rms_norm(h, lw["ffn_norm"], cfg.norm_eps)
        mlp = (jax.nn.silu(x @ lw["w1"].T) * (x @ lw["w3"].T)) @ lw["w2"].T
        h = h + mlp

    h = rms_norm(h, weights["final_norm"], cfg.norm_eps)
    lm_head = weights.get("lm_head")
    if lm_head is None:
        lm_head = weights["embed"]
    logits = (h @ jnp.asarray(lm_head, compute_dtype).T).astype(jnp.float32)
    new_cache = Lfm2Cache(
        k=jnp.stack(ks) if ks else cache.k,
        v=jnp.stack(vs) if vs else cache.v,
        conv=jnp.stack(convs) if convs else cache.conv,
    )
    return logits, new_cache


def make_paged_cache(cfg: Lfm2Config, num_blocks: int, block_size: int,
                     n_slots: int, dtype=jnp.float32) -> dict:
    """Hybrid engine cache (analog of the reference's
    `kv_cache/hybrid_cache.rs`): paged KV pools for attention layers +
    per-SLOT conv windows for the short-conv layers. One trailing trash
    row/slot absorbs dropped writes (index -1)."""
    n_attn = sum(t == "full_attention" for t in cfg.layer_types)
    n_conv = cfg.num_layers - n_attn
    s_total = (num_blocks + 1) * block_size
    return {
        "k": jnp.zeros((n_attn, s_total, cfg.num_kv_heads, cfg.head_dim), dtype),
        "v": jnp.zeros((n_attn, s_total, cfg.num_kv_heads, cfg.head_dim), dtype),
        "conv": jnp.zeros(
            (n_conv, n_slots + 1, cfg.hidden_size, cfg.conv_l_cache), dtype
        ),
    }


def _conv_mixer_paged(cfg, lw, x, conv_prev, row_len, decode):
    """Short-conv mixer over per-slot state with chunk continuation.

    conv_prev [B, H, L] = last L gated inputs before this chunk (zeroed on
    reset); row_len [B] = valid tokens in this chunk. The conv runs over
    the concatenated [prev ‖ chunk] timeline so chunked prefill is exact;
    the new state is gathered at each row's true length."""
    bcx = x @ lw["in_proj"].T
    if lw.get("in_proj_bias") is not None:
        bcx = bcx + lw["in_proj_bias"]
    h = cfg.hidden_size
    b_g, c_g, xin = bcx[..., :h], bcx[..., h : 2 * h], bcx[..., 2 * h :]
    bx = b_g * xin  # [B, T, H]
    w = lw["conv_w"]  # [H, L]
    L = cfg.conv_l_cache
    t = bx.shape[1]
    if decode:
        state = jnp.concatenate(
            [conv_prev[..., 1:], jnp.swapaxes(bx, 1, 2)], axis=-1
        )
        conv_out = jnp.sum(state * w[None], axis=-1)[:, None, :]
        new_state = state
    else:
        timeline = jnp.concatenate([jnp.swapaxes(conv_prev, 1, 2), bx], 1)
        conv_out = jnp.zeros_like(bx)
        for j in range(L):
            conv_out = conv_out + timeline[:, j + 1 : j + 1 + t, :] * w[:, j]
        idx = (row_len[:, None] + jnp.arange(L)[None, :])[..., None]
        new_state = jnp.swapaxes(
            jnp.take_along_axis(timeline, idx, axis=1), 1, 2
        )
    if lw.get("conv_b") is not None:
        conv_out = conv_out + lw["conv_b"]
    y = c_g * conv_out
    out = y @ lw["out_proj"].T
    if lw.get("out_proj_bias") is not None:
        out = out + lw["out_proj_bias"]
    return out, new_state


def lfm2_forward_paged(
    weights: dict,
    cfg: Lfm2Config,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,  # make_paged_cache pools
    block_tables: jax.Array,  # [B, W] int32
    slot_mapping: jax.Array,  # [B, T] int32 (< 0 → dropped)
    kv_lens: jax.Array,  # [B] lengths AFTER this step's writes
    slot_ids: jax.Array,  # [B] engine decode slot per row (< 0 → trash)
    resets: jax.Array,  # [B] 1 → zero conv state before this chunk
    *,
    block_size: int,
    decode: bool = False,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,  # [B, T, H]: VLM merged rows
):
    """Engine-servable LFM2 hybrid step (prefill chunk or decode). Mirrors
    `forward_paged` (models/llama.py) batch/slot/table conventions; the
    reference serves this arch via the Pipeline trait + hybrid cache
    (`mistralrs-core/src/models/lfm2.rs`, `kv_cache/hybrid_cache.rs`)."""
    b, t = input_ids.shape
    if input_embeds is not None:
        h = input_embeds.astype(compute_dtype)
    else:
        h = jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    inv = rope_frequencies(cfg.head_dim, cfg.rope_theta, None)
    cos, sin = rope_cos_sin(positions, inv)

    trash_slot = cache["conv"].shape[1] - 1
    slot_safe = jnp.where(slot_ids < 0, trash_slot, slot_ids)
    reset_keep = (1.0 - resets.astype(jnp.float32))
    if decode:
        row_len = jnp.where(slot_ids < 0, 0, t)
    elif last_indices is not None:
        row_len = jnp.where(slot_ids < 0, 0, last_indices.astype(jnp.int32) + 1)
    else:
        row_len = jnp.where(slot_ids < 0, 0, t)

    kv_trash = cache["k"].shape[1] - 1
    flat_slots = jnp.where(
        slot_mapping.reshape(b * t) < 0, kv_trash, slot_mapping.reshape(b * t)
    )
    bt_safe = jnp.maximum(block_tables, 0)
    gather_slots = (
        bt_safe[:, :, None] * block_size + jnp.arange(block_size)[None, None, :]
    ).reshape(b, -1)  # [B, S]

    new_cache = {k: v for k, v in cache.items()}
    ai = ci = 0
    for li, lt in enumerate(cfg.layer_types):
        lw = weights["layers"][li]
        x = rms_norm(h, lw["operator_norm"], cfg.norm_eps)
        if lt == "full_attention":
            q = (x @ lw["wq"].T).reshape(b, t, cfg.num_heads, cfg.head_dim)
            k = (x @ lw["wk"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
            v = (x @ lw["wv"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
            q = rms_norm(q, lw["q_norm"], cfg.norm_eps)
            k = rms_norm(k, lw["k_norm"], cfg.norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kp = new_cache["k"].at[ai, flat_slots].set(
                k.reshape(b * t, cfg.num_kv_heads, cfg.head_dim).astype(
                    new_cache["k"].dtype
                )
            )
            vp = new_cache["v"].at[ai, flat_slots].set(
                v.reshape(b * t, cfg.num_kv_heads, cfg.head_dim).astype(
                    new_cache["v"].dtype
                )
            )
            new_cache["k"], new_cache["v"] = kp, vp
            kk = kp[ai][gather_slots].astype(compute_dtype)
            vv = vp[ai][gather_slots].astype(compute_dtype)
            attn = sdpa(q, kk, vv, q_positions=positions, kv_len=kv_lens)
            out = attn.reshape(b, t, -1) @ lw["wo"].T
            ai += 1
        else:
            conv_prev = (
                new_cache["conv"][ci][slot_safe]
                * reset_keep[:, None, None].astype(new_cache["conv"].dtype)
            )
            out, nstate = _conv_mixer_paged(
                cfg, lw, x, conv_prev, row_len, decode
            )
            new_cache["conv"] = new_cache["conv"].at[ci, slot_safe].set(
                nstate.astype(new_cache["conv"].dtype)
            )
            ci += 1
        h = h + out
        x = rms_norm(h, lw["ffn_norm"], cfg.norm_eps)
        mlp = (jax.nn.silu(x @ lw["w1"].T) * (x @ lw["w3"].T)) @ lw["w2"].T
        h = h + mlp

    h = rms_norm(h, weights["final_norm"], cfg.norm_eps)
    if logits_last_only:
        if last_indices is not None:
            h = jnp.take_along_axis(
                h, last_indices.astype(jnp.int32)[:, None, None], axis=1
            )
        else:
            h = h[:, -1:, :]
    lm_head = weights.get("lm_head")
    if lm_head is None:
        lm_head = weights["embed"]
    logits = (h @ jnp.asarray(lm_head, compute_dtype).T).astype(jnp.float32)
    return logits, new_cache


def lfm2_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Lfm2Config, dtype=jnp.float32
) -> dict:
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        arr = sd.get(pre + name)
        return None if arr is None else jnp.asarray(arr, dtype)

    layers = []
    for i, lt in enumerate(cfg.layer_types):
        p = f"layers.{i}."
        lw: dict[str, Any] = {
            "operator_norm": g(p + "operator_norm.weight"),
            "ffn_norm": g(p + "ffn_norm.weight"),
            "w1": g(p + "feed_forward.w1.weight"),
            "w2": g(p + "feed_forward.w2.weight"),
            "w3": g(p + "feed_forward.w3.weight"),
        }
        if lt == "full_attention":
            lw.update(
                wq=g(p + "self_attn.q_proj.weight"),
                wk=g(p + "self_attn.k_proj.weight"),
                wv=g(p + "self_attn.v_proj.weight"),
                wo=g(p + "self_attn.out_proj.weight"),
                q_norm=g(p + "self_attn.q_layernorm.weight"),
                k_norm=g(p + "self_attn.k_layernorm.weight"),
            )
        else:
            conv_w = g(p + "conv.conv.weight")  # [H, 1, L]
            lw.update(
                conv_w=conv_w.reshape(cfg.hidden_size, cfg.conv_l_cache),
                conv_b=g(p + "conv.conv.bias"),
                in_proj=g(p + "conv.in_proj.weight"),
                in_proj_bias=g(p + "conv.in_proj.bias"),
                out_proj=g(p + "conv.out_proj.weight"),
                out_proj_bias=g(p + "conv.out_proj.bias"),
            )
        layers.append(lw)
    return {
        "embed": g("embed_tokens.weight"),
        "layers": layers,
        "final_norm": g("embedding_norm.weight"),
        "lm_head": (
            None if cfg.tie_word_embeddings else jnp.asarray(sd["lm_head.weight"], dtype)
        ),
    }


def lfm2_greedy_generate(
    weights: dict, cfg: Lfm2Config, prompt_ids, max_new_tokens: int = 16,
) -> list[int]:
    """Greedy decode (prefill + conv/KV cached single-token steps)."""
    ids = jnp.asarray(np.asarray(prompt_ids, np.int32)[None])
    t0 = ids.shape[1]
    cache = Lfm2Cache.create(cfg, 1, t0 + max_new_tokens)
    positions = jnp.arange(t0, dtype=jnp.int32)[None]
    logits, cache = lfm2_forward(
        weights, cfg, ids, positions, cache, jnp.zeros((1,), jnp.int32)
    )
    out = []
    tok = jnp.argmax(logits[:, -1], axis=-1)
    for step in range(max_new_tokens):
        tok_i = int(tok[0])
        if tok_i in cfg.eos_token_ids:
            break
        out.append(tok_i)
        pos = jnp.asarray([[t0 + step]], jnp.int32)
        logits, cache = lfm2_forward(
            weights, cfg, tok[None].astype(jnp.int32), pos, cache,
            jnp.asarray([t0 + step], jnp.int32), decode=True,
        )
        tok = jnp.argmax(logits[:, -1], axis=-1)
    return out
