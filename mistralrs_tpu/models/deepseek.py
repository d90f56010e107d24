"""DeepSeek V2/V3 — multi-head latent attention (MLA) + DeepSeek-MoE
(the analog of `mistralrs-core/src/models/deepseek2.rs`/`deepseek3.rs` and
the MLA kernels `mistralrs-core/src/mla/`).

MLA: queries/keys split into a no-RoPE part (projected from a compressed
latent) and a small RoPE part shared MQA-style across heads; KV is stored
compressed (kv_lora_rank + rope dim) and up-projected per head.

MoE: sigmoid scoring with e-score correction bias and optional group-limited
top-k (V3), softmax scoring (V2); shared experts always active; first
``first_k_dense_replace`` layers use a dense MLP.

This implementation caches the *full* per-head K/V (correctness-first; the
compressed-cache "absorbed" variant is the later optimization the reference
implements in `mla/weights.rs`)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from ..ops.norms import rms_norm
from ..ops.rope import rope_frequencies
from ..quant.linear import embedding_lookup, linear


@dataclass
class DeepseekConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    moe_intermediate_size: int
    num_layers: int
    num_heads: int
    q_lora_rank: Optional[int]
    kv_lora_rank: int
    qk_rope_head_dim: int
    qk_nope_head_dim: int
    v_head_dim: int
    n_routed_experts: int
    num_experts_per_tok: int
    n_shared_experts: int
    first_k_dense_replace: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    routed_scaling_factor: float = 1.0
    scoring_func: str = "sigmoid"  # v3; "softmax" for v2
    norm_topk_prob: bool = True
    n_group: int = 1
    topk_group: int = 1
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    moe_layer_freq: int = 1  # glm4_moe_lite: layer i is MoE iff
    # i >= first_k_dense_replace and i % moe_layer_freq == 0 (reference
    # models/glm4_moe_lite.rs:715); only freq=1 (every layer past the dense
    # prefix, all released checkpoints) fits the dense-prefix/moe-suffix
    # stacked-segment layout here
    eos_token_ids: tuple = ()

    @property
    def qk_head_dim(self) -> int:
        return self.qk_rope_head_dim + self.qk_nope_head_dim

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "DeepseekConfig":
        if (d.get("moe_layer_freq", 1) or 1) != 1:
            raise NotImplementedError(
                "moe_layer_freq > 1: interleaved dense/MoE layers"
            )
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            moe_intermediate_size=d.get("moe_intermediate_size", d["intermediate_size"]),
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            q_lora_rank=d.get("q_lora_rank"),
            kv_lora_rank=d["kv_lora_rank"],
            qk_rope_head_dim=d["qk_rope_head_dim"],
            qk_nope_head_dim=d["qk_nope_head_dim"],
            v_head_dim=d["v_head_dim"],
            n_routed_experts=d.get("n_routed_experts", 0) or 0,
            num_experts_per_tok=d.get("num_experts_per_tok", 0) or 0,
            n_shared_experts=d.get("n_shared_experts", 0) or 0,
            first_k_dense_replace=d.get("first_k_dense_replace", 0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10000.0),
            routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
            scoring_func=d.get("scoring_func", "sigmoid"),
            norm_topk_prob=d.get("norm_topk_prob", True),
            n_group=d.get("n_group", 1) or 1,
            topk_group=d.get("topk_group", 1) or 1,
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            moe_layer_freq=d.get("moe_layer_freq", 1) or 1,
        )


def _interleaved_rope(x, cos, sin):
    """DeepSeek applies rotate-half AFTER de-interleaving pairs: the HF impl
    views [.., d] as [.., d/2, 2] → transpose → rotate_half."""
    b, t, h, d = x.shape
    x = x.reshape(b, t, h, d // 2, 2)
    x = jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)  # de-interleave
    half = d // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1)


def _mla_attention(cfg, lw, h, cos, sin, k_cache, v_cache, positions, kv_start, backend):
    b, t, _ = h.shape
    nh = cfg.num_heads
    if cfg.q_lora_rank:
        q = linear(h, lw["q_a"], backend=backend)
        q = rms_norm(q, lw["q_a_norm"], cfg.rms_norm_eps)
        q = linear(q, lw["q_b"], backend=backend)
    else:
        q = linear(h, lw["q"], backend=backend)
    q = q.reshape(b, t, nh, cfg.qk_head_dim)
    q_nope, q_pe = q[..., : cfg.qk_nope_head_dim], q[..., cfg.qk_nope_head_dim :]

    ckv = linear(h, lw["kv_a"], backend=backend)  # [B,T, rank + rope_dim]
    compressed, k_pe = (
        ckv[..., : cfg.kv_lora_rank],
        ckv[..., cfg.kv_lora_rank :],
    )
    compressed = rms_norm(compressed, lw["kv_a_norm"], cfg.rms_norm_eps)
    kv = linear(compressed, lw["kv_b"], backend=backend).reshape(
        b, t, nh, cfg.qk_nope_head_dim + cfg.v_head_dim
    )
    k_nope = kv[..., : cfg.qk_nope_head_dim]
    v = kv[..., cfg.qk_nope_head_dim :]

    q_pe = _interleaved_rope(q_pe, cos, sin)
    k_pe = _interleaved_rope(k_pe[:, :, None, :], cos, sin)  # MQA: one head
    k_pe = jnp.broadcast_to(k_pe, (b, t, nh, cfg.qk_rope_head_dim))

    q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
    k_full = jnp.concatenate([k_nope, k_pe], axis=-1)
    # pad V to qk_head_dim so one cache/sdpa call serves both (cropped after)
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, cfg.qk_head_dim - cfg.v_head_dim)))

    def write(cache, new):
        def one(row, new_row, start):
            return jax.lax.dynamic_update_slice(row, new_row, (start, 0, 0))
        return jax.vmap(one)(cache, new.astype(cache.dtype), kv_start)

    k_cache = write(k_cache, k_full)
    v_cache = write(v_cache, v_pad)
    kv_len = kv_start + t
    scale = cfg.qk_head_dim ** -0.5
    attn = sdpa(
        q_full, k_cache, v_cache, q_positions=positions, kv_len=kv_len, scale=scale
    )[..., : cfg.v_head_dim]
    attn = attn.reshape(b, t, nh * cfg.v_head_dim)
    return linear(attn, lw["o"], backend=backend), k_cache, v_cache


def _mla_attention_absorbed(
    cfg, lw, h, cos, sin, c_cache, pe_cache, positions, kv_start, backend
):
    """Absorbed/compressed-cache MLA (the analog of the reference's MLA
    decode path, `mistralrs-core/src/mla/`): cache ONLY the kv_lora_rank
    latent + the roped shared k_pe — ``rank + rope`` floats per token
    instead of ``num_heads * qk_head_dim * 2``. The up-projections are
    absorbed: ``W_uk`` folds into the query, ``W_uv`` into the output.

    scores[h,t,s] = (q_nope[h,t] W_uk[h]) · c[s] + q_pe[h,t] · k_pe[s]
    out[h,t]     = (Σ_s softmax · c[s]) W_uv[h]ᵀ
    """
    b, t, _ = h.shape
    nh = cfg.num_heads
    if cfg.q_lora_rank:
        q = linear(h, lw["q_a"], backend=backend)
        q = rms_norm(q, lw["q_a_norm"], cfg.rms_norm_eps)
        q = linear(q, lw["q_b"], backend=backend)
    else:
        q = linear(h, lw["q"], backend=backend)
    q = q.reshape(b, t, nh, cfg.qk_head_dim)
    q_nope, q_pe = q[..., : cfg.qk_nope_head_dim], q[..., cfg.qk_nope_head_dim :]
    q_pe = _interleaved_rope(q_pe, cos, sin)

    ckv = linear(h, lw["kv_a"], backend=backend)
    compressed = rms_norm(
        ckv[..., : cfg.kv_lora_rank], lw["kv_a_norm"], cfg.rms_norm_eps
    )
    k_pe = _interleaved_rope(
        ckv[..., None, cfg.kv_lora_rank :], cos, sin
    )[:, :, 0]  # [B, T, rope]

    def write(cache, new):
        def one(row, new_row, start):
            return jax.lax.dynamic_update_slice(row, new_row, (start, 0))
        return jax.vmap(one)(cache, new.astype(cache.dtype), kv_start)

    c_cache = write(c_cache, compressed)
    pe_cache = write(pe_cache, k_pe)
    kv_len = kv_start + t

    # absorb W_uk into the query: per-head latent queries [B, T, nh, rank]
    q_lat = jnp.einsum("bthn,hnr->bthr", q_nope, lw["w_uk"].astype(q_nope.dtype))
    scores = (
        jnp.einsum("bthr,bsr->bhts", q_lat.astype(jnp.float32),
                   c_cache.astype(jnp.float32))
        + jnp.einsum("bthp,bsp->bhts", q_pe.astype(jnp.float32),
                     pe_cache.astype(jnp.float32))
    ) * (cfg.qk_head_dim ** -0.5)
    s_idx = jnp.arange(c_cache.shape[1])
    mask = (s_idx[None, None, None, :] <= positions[:, None, :, None]) & (
        s_idx[None, None, None, :] < kv_len[:, None, None, None]
    )
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    lat = jnp.einsum("bhts,bsr->bthr", probs, c_cache.astype(jnp.float32))
    out = jnp.einsum(
        "bthr,hvr->bthv", lat, lw["w_uv"].astype(jnp.float32)
    ).astype(h.dtype)
    out = out.reshape(b, t, nh * cfg.v_head_dim)
    return linear(out, lw["o"], backend=backend), c_cache, pe_cache


def _dense_mlp(h, lw, backend):
    from ..lora import apply_lora_delta

    gate = apply_lora_delta(
        linear(h, lw["gate"], backend=backend), h, lw.get("gate_lora")
    )
    up = apply_lora_delta(
        linear(h, lw["up"], backend=backend), h, lw.get("up_lora")
    )
    hid = jax.nn.silu(gate) * up
    return apply_lora_delta(
        linear(hid, lw["down"], backend=backend), hid, lw.get("down_lora")
    )


def _moe(cfg, lw, h, backend):
    b, t, _ = h.shape
    logits = linear(h.astype(jnp.float32), lw["router"], backend=backend)
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    biased = scores + lw.get("router_bias", jnp.zeros_like(scores[..., 0, None]))
    if cfg.n_group > 1 and cfg.n_routed_experts % cfg.n_group == 0:
        # group-limited routing: keep only the top groups' experts
        gsz = cfg.n_routed_experts // cfg.n_group
        gs = biased.reshape(b, t, cfg.n_group, gsz)
        group_scores = jnp.sum(
            jax.lax.top_k(gs, min(2, gsz))[0], axis=-1
        )  # [B,T,G]
        _, top_groups = jax.lax.top_k(group_scores, cfg.topk_group)
        gmask = jnp.zeros((b, t, cfg.n_group), bool).at[
            jnp.arange(b)[:, None, None], jnp.arange(t)[None, :, None], top_groups
        ].set(True)
        biased = jnp.where(
            jnp.repeat(gmask, gsz, axis=-1), biased, -jnp.inf
        )
    _, topi = jax.lax.top_k(biased, cfg.num_experts_per_tok)
    topw = jnp.take_along_axis(scores, topi, axis=-1)  # weights use raw scores
    if cfg.norm_topk_prob:
        topw = topw / jnp.maximum(jnp.sum(topw, axis=-1, keepdims=True), 1e-20)
    topw = topw * cfg.routed_scaling_factor
    full_w = (
        jnp.zeros((b, t, cfg.n_routed_experts), jnp.float32)
        .at[jnp.arange(b)[:, None, None], jnp.arange(t)[None, :, None], topi]
        .add(topw)
    )

    def expert(carry, xs):
        acc, idx = carry
        y = _dense_mlp(h, xs, backend)
        acc = acc + y * full_w[..., idx][..., None].astype(y.dtype)
        return (acc, idx + 1), None

    (out, _), _ = jax.lax.scan(expert, (jnp.zeros_like(h), jnp.int32(0)), lw["experts"])
    if "shared" in lw:
        out = out + _dense_mlp(h, lw["shared"], backend)
    return out


def deepseek_forward(
    weights: dict,
    cfg: DeepseekConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    cache,  # dict {dense: (k, v), moe: (k, v)} each [Lseg, B, S, nh, qk_dim]
    kv_start: jax.Array,
    *,
    backend=None,
    compute_dtype=jnp.float32,
    logits_last_only: bool = False,
    absorbed: bool = False,  # compressed-latent cache (make_cache(absorbed=True))
):
    h = embedding_lookup(input_ids, weights["embed"], dtype=compute_dtype)
    inv = rope_frequencies(cfg.qk_rope_head_dim, cfg.rope_theta)
    angles = positions.astype(jnp.float32)[..., None] * inv
    cos, sin = jnp.cos(angles).astype(compute_dtype), jnp.sin(angles).astype(compute_dtype)

    new_cache = {}
    for seg in ("dense", "moe"):
        if seg not in weights["segments"]:
            continue
        seg_w = weights["segments"][seg]
        k_c, v_c = cache[seg]

        def body(hh, xs):
            lw, kc, vc = xs
            x = rms_norm(hh, lw["attn_norm"], cfg.rms_norm_eps)
            if absorbed:
                attn, kc, vc = _mla_attention_absorbed(
                    cfg, lw, x, cos, sin, kc, vc, positions, kv_start, backend
                )
            else:
                attn, kc, vc = _mla_attention(
                    cfg, lw, x, cos, sin, kc, vc, positions, kv_start, backend
                )
            hh = hh + attn
            x = rms_norm(hh, lw["ffn_norm"], cfg.rms_norm_eps)
            if seg == "moe":
                hh = hh + _moe(cfg, lw, x, backend)
            else:
                hh = hh + _dense_mlp(x, lw, backend)
            return hh, (kc, vc)

        h, (k_c, v_c) = jax.lax.scan(body, h, (seg_w, k_c, v_c))
        new_cache[seg] = (k_c, v_c)

    h = rms_norm(h, weights["final_norm"], cfg.rms_norm_eps)
    if logits_last_only:
        h = h[:, -1:, :]
    head = weights.get("lm_head")
    if head is None:
        head = weights["embed"]
    logits = linear(h, head, backend=backend).astype(jnp.float32)
    return logits, new_cache


def _mla_attention_paged(
    cfg, lw, h, cos, sin, pool, li, write_slots, gather_slots, positions,
    kv_lens, backend, block_size=None, block_tables=None, scale_plane=None,
):
    """Absorbed MLA over a PAGED latent pool (the engine-serving analog of
    the reference's MLA decode path + paged cache,
    `mistralrs-core/src/mla/` + `paged_attention/cache_engine.rs`).

    The pool stores ``[compressed_latent ‖ roped k_pe]`` rows (zero-padded
    to a 128-lane multiple) — one row per token — so MLA is MQA over the
    combined vector: scores = [q_lat ‖ q_pe] · row, values = row[:rank].
    Dropped writes (slot < 0) land in the trash row at the end of the pool.

    ``pool`` is the FULL segment ``[Lseg, S_total, D_pad]`` with ``li`` the
    layer plane; at decode (t == 1) on TPU the fused Pallas kernel
    (`ops/mla_attention.py`) writes + attends in one pass — the analog of
    `concat_and_cache_mla.cu` + `flashinfer_mla_decode.cu`."""
    from ..lora import apply_lora_delta

    b, t, _ = h.shape
    nh = cfg.num_heads
    rank = cfg.kv_lora_rank
    if cfg.q_lora_rank:
        q = apply_lora_delta(
            linear(h, lw["q_a"], backend=backend), h, lw.get("q_a_lora")
        )
        qa = rms_norm(q, lw["q_a_norm"], cfg.rms_norm_eps)
        q = apply_lora_delta(
            linear(qa, lw["q_b"], backend=backend), qa, lw.get("q_b_lora")
        )
    else:
        q = apply_lora_delta(
            linear(h, lw["q"], backend=backend), h, lw.get("q_lora")
        )
    q = q.reshape(b, t, nh, cfg.qk_head_dim)
    q_nope, q_pe = q[..., : cfg.qk_nope_head_dim], q[..., cfg.qk_nope_head_dim :]
    q_pe = _interleaved_rope(q_pe, cos, sin)
    q_lat = jnp.einsum("bthn,hnr->bthr", q_nope, lw["w_uk"].astype(q_nope.dtype))
    q_comb = jnp.concatenate([q_lat, q_pe], axis=-1)  # [B,T,nh,rank+rope]

    ckv = linear(h, lw["kv_a"], backend=backend)
    compressed = rms_norm(
        ckv[..., :rank], lw["kv_a_norm"], cfg.rms_norm_eps
    )
    k_pe = _interleaved_rope(ckv[..., None, rank:], cos, sin)[:, :, 0]
    rows = jnp.concatenate([compressed, k_pe], axis=-1)  # [B,T,D]
    d_pad = pool.shape[-1]
    d = rows.shape[-1]
    if d_pad != d:  # zero pad contributes 0 to every score
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, d_pad - d)))
        q_comb = jnp.pad(q_comb, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))

    import os as _os

    use_kernel = (
        t == 1
        and scale_plane is None  # quantized latent pools: gather path
        # (the fused-kernel int8 variant is future work)
        and block_tables is not None
        and rank % 128 == 0
        and block_size is not None
        and block_size % 8 == 0
        and (backend == "pallas"
             or (backend is None and jax.default_backend() == "tpu"))
        and _os.environ.get("MRSTPU_MLA_KERNEL", "1") != "0"
    )
    if use_kernel:
        from ..ops.mla_attention import mla_decode_fused

        out_lat, pool = mla_decode_fused(
            q_comb[:, 0], pool, rows[:, 0], write_slots, block_tables,
            kv_lens, li, rank=rank, block_size=block_size,
            scale=cfg.qk_head_dim ** -0.5,
        )
        lat = out_lat[:, None].astype(jnp.float32)  # [B, 1, nh, rank]
        out = jnp.einsum(
            "bthr,hvr->bthv", lat, lw["w_uv"].astype(jnp.float32)
        ).astype(h.dtype)
        out = out.reshape(b, t, nh * cfg.v_head_dim)
        o = apply_lora_delta(
            linear(out, lw["o"], backend=backend), out, lw.get("o_lora")
        )
        return o, pool, None

    trash = pool.shape[1] - 1
    safe = jnp.where(write_slots < 0, trash, write_slots)
    flat_rows = rows.reshape(b * t, -1)
    if scale_plane is not None:  # 1-byte latent pool: per-row abs-max scale
        amax = jnp.max(jnp.abs(flat_rows.astype(jnp.float32)), axis=-1)
        cap = 127.0 if pool.dtype == jnp.int8 else 448.0
        sc = amax / cap
        enc = flat_rows.astype(jnp.float32) / jnp.maximum(sc, 1e-10)[:, None]
        if pool.dtype == jnp.int8:
            enc = jnp.clip(jnp.round(enc), -127, 127)
        pool = pool.at[li, safe].set(enc.astype(pool.dtype))
        sw = scale_plane.shape[-1]
        srow = jnp.zeros((b * t, sw), scale_plane.dtype).at[:, 0].set(
            sc.astype(scale_plane.dtype))
        scale_plane = scale_plane.at[li, safe].set(srow)
        keys = (
            pool[li][gather_slots].astype(jnp.float32)
            * scale_plane[li][gather_slots][..., :1].astype(jnp.float32)
        )  # [B, S, D]
    else:
        pool = pool.at[li, safe].set(flat_rows.astype(pool.dtype))
        keys = pool[li][gather_slots].astype(jnp.float32)  # [B, S, D]
    scores = jnp.einsum(
        "bthd,bsd->bhts", q_comb.astype(jnp.float32), keys
    ) * (cfg.qk_head_dim ** -0.5)
    s_idx = jnp.arange(keys.shape[1])
    mask = (s_idx[None, None, None, :] <= positions[:, None, :, None]) & (
        s_idx[None, None, None, :] < kv_lens[:, None, None, None]
    )
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    lat = jnp.einsum("bhts,bsr->bthr", probs, keys[..., :rank])
    out = jnp.einsum(
        "bthr,hvr->bthv", lat, lw["w_uv"].astype(jnp.float32)
    ).astype(h.dtype)
    out = out.reshape(b, t, nh * cfg.v_head_dim)
    o = apply_lora_delta(
        linear(out, lw["o"], backend=backend), out, lw.get("o_lora")
    )
    return o, pool, scale_plane


def deepseek_forward_paged(
    weights: dict,
    cfg: DeepseekConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,  # {seg: [Lseg, S_total, rank+rope]} paged latent pools
    block_tables: jax.Array,  # [B, W] int32
    slot_mapping: jax.Array,  # [B*T] int32 write slots (< 0 → dropped)
    kv_lens: jax.Array,  # [B] int32 lengths AFTER this step's writes
    *,
    block_size: int,
    backend=None,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
    lora_scalings: Optional[jax.Array] = None,  # [B, T, A] per-request mix
):
    """Engine-servable absorbed-MLA step over the paged latent pool
    (prefill chunk or decode). Mirrors `forward_paged` (models/llama.py) —
    same batch/slot/table conventions — so the continuous-batching engine
    can drive DeepSeek (reference serves it via the Pipeline trait,
    `mistralrs-core/src/models/deepseek2.rs`)."""
    b, t = input_ids.shape
    h = embedding_lookup(input_ids, weights["embed"], dtype=compute_dtype)
    inv = rope_frequencies(cfg.qk_rope_head_dim, cfg.rope_theta)
    angles = positions.astype(jnp.float32)[..., None] * inv
    cos = jnp.cos(angles).astype(compute_dtype)
    sin = jnp.sin(angles).astype(compute_dtype)

    bt_safe = jnp.maximum(block_tables, 0)
    gather_slots = (
        bt_safe[:, :, None] * block_size + jnp.arange(block_size)[None, None, :]
    ).reshape(b, -1)  # [B, S] pool rows in logical order

    new_cache = {}
    for seg in ("dense", "moe"):
        if seg not in weights["segments"]:
            continue
        seg_w = weights["segments"][seg]
        pool = cache[seg]
        scales = cache.get(seg + "_scale")

        def body(carry, xs):
            hh, pl_, sc_ = carry
            lw, li = xs
            if lora_scalings is not None:
                # per-request adapter mix rides every bank entry (the same
                # one-hot X-LoRA path as forward_paged, models/llama.py)
                lw = {
                    k: (dict(v, xlora_scalings=lora_scalings)
                        if k.endswith("_lora") and isinstance(v, dict)
                        and "xlora_scalings" not in v else v)
                    for k, v in lw.items()
                }
            x = rms_norm(hh, lw["attn_norm"], cfg.rms_norm_eps)
            # the FULL pool rides the carry (not xs: slicing a pool plane
            # per scan step would copy it); the layer index selects the
            # plane — scalar-prefetched in the fused kernel, dynamic-sliced
            # on the gather path
            attn, pl_, sc_ = _mla_attention_paged(
                cfg, lw, x, cos, sin, pl_, li, slot_mapping, gather_slots,
                positions, kv_lens, backend,
                block_size=block_size, block_tables=bt_safe,
                scale_plane=sc_,
            )
            hh = hh + attn
            x = rms_norm(hh, lw["ffn_norm"], cfg.rms_norm_eps)
            if seg == "moe":
                hh = hh + _moe(cfg, lw, x, backend)
            else:
                hh = hh + _dense_mlp(x, lw, backend)
            return (hh, pl_, sc_), None

        n_seg = pool.shape[0]
        (h, pool, scales), _ = jax.lax.scan(
            body, (h, pool, scales), (seg_w, jnp.arange(n_seg, dtype=jnp.int32))
        )
        new_cache[seg] = pool
        if scales is not None:
            new_cache[seg + "_scale"] = scales

    h = rms_norm(h, weights["final_norm"], cfg.rms_norm_eps)
    if logits_last_only:
        if last_indices is not None:
            h = jnp.take_along_axis(
                h, last_indices.astype(jnp.int32)[:, None, None], axis=1
            )
        else:
            h = h[:, -1:, :]
    head = weights.get("lm_head")
    if head is None:
        head = weights["embed"]
    logits = linear(h, head, backend=backend).astype(jnp.float32)
    return logits, new_cache


def make_paged_cache(
    cfg: DeepseekConfig, num_blocks: int, block_size: int, dtype=jnp.float32,
    kv_quant=None,
) -> dict:
    """Paged latent pools {seg: [Lseg, S_total, D_pad]} with a trailing
    trash block for dropped writes (slot −1). Rows are ``rank + rope``
    zero-padded to a 128-lane multiple so the fused decode kernel's DMA
    stripes tile cleanly (pad columns contribute 0 to every score).

    ``kv_quant`` ('int8'/'fp8') stores the latent rows 1-byte with a
    per-(layer, slot) abs-max scale in a slot-major plane
    ``{seg}_scale: [Lseg, S_total, 128]`` (lane 0; 128-lane row so the
    fused kernel's scale DMA is Mosaic-legal) — the MLA analog of the
    paged KV quantization in kv/paged.py."""
    s_total = (num_blocks + 1) * block_size
    d = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    d = -(-d // 128) * 128
    store = dtype
    if kv_quant:
        store = jnp.int8 if kv_quant == "int8" else jnp.float8_e4m3fn

    def seg(n_layers):
        return jnp.zeros((n_layers, s_total, d), store)

    k = cfg.first_k_dense_replace
    out = {}
    if k > 0:
        out["dense"] = seg(k)
    if cfg.num_layers - k > 0:
        out["moe"] = seg(cfg.num_layers - k)
    if kv_quant:
        for name in list(out):
            out[name + "_scale"] = jnp.zeros(
                (out[name].shape[0], s_total, 128), jnp.bfloat16)
    return out


def make_cache(cfg: DeepseekConfig, batch: int, capacity: int,
               dtype=jnp.float32, absorbed: bool = False):
    def seg(n_layers):
        if absorbed:  # latent + shared rope key: rank + rope per token
            return (
                jnp.zeros((n_layers, batch, capacity, cfg.kv_lora_rank), dtype),
                jnp.zeros((n_layers, batch, capacity, cfg.qk_rope_head_dim), dtype),
            )
        shape = (n_layers, batch, capacity, cfg.num_heads, cfg.qk_head_dim)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    k = cfg.first_k_dense_replace
    out = {}
    if k > 0:
        out["dense"] = seg(k)
    if cfg.num_layers - k > 0:
        out["moe"] = seg(cfg.num_layers - k)
    return out


def deepseek_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: DeepseekConfig, dtype=jnp.float32,
    absorbed: bool = False,
) -> dict:
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        return jnp.asarray(np.asarray(sd[pre + name], np.float32), dtype)

    def layer_weights(i: int, moe: bool) -> dict:
        p = f"layers.{i}."
        lw = {
            "attn_norm": g(p + "input_layernorm.weight"),
            "ffn_norm": g(p + "post_attention_layernorm.weight"),
            "kv_a": g(p + "self_attn.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": g(p + "self_attn.kv_a_layernorm.weight"),
            "kv_b": g(p + "self_attn.kv_b_proj.weight"),
            "o": g(p + "self_attn.o_proj.weight"),
        }
        if absorbed:
            # split kv_b [nh*(nope+v), rank] into per-head absorbed factors
            kvb = np.asarray(sd[pre + p + "self_attn.kv_b_proj.weight"], np.float32)
            kvb = kvb.reshape(
                cfg.num_heads, cfg.qk_nope_head_dim + cfg.v_head_dim, -1
            )
            lw["w_uk"] = jnp.asarray(kvb[:, : cfg.qk_nope_head_dim], dtype)
            lw["w_uv"] = jnp.asarray(kvb[:, cfg.qk_nope_head_dim :], dtype)
        if cfg.q_lora_rank:
            lw["q_a"] = g(p + "self_attn.q_a_proj.weight")
            lw["q_a_norm"] = g(p + "self_attn.q_a_layernorm.weight")
            lw["q_b"] = g(p + "self_attn.q_b_proj.weight")
        else:
            lw["q"] = g(p + "self_attn.q_proj.weight")
        if moe:
            lw["router"] = g(p + "mlp.gate.weight")
            if pre + p + "mlp.gate.e_score_correction_bias" in sd:
                lw["router_bias"] = g(p + "mlp.gate.e_score_correction_bias")
            experts = []
            for e in range(cfg.n_routed_experts):
                ep = p + f"mlp.experts.{e}."
                experts.append(
                    {
                        "gate": g(ep + "gate_proj.weight"),
                        "up": g(ep + "up_proj.weight"),
                        "down": g(ep + "down_proj.weight"),
                    }
                )
            lw["experts"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *experts)
            if cfg.n_shared_experts:
                spp = p + "mlp.shared_experts."
                lw["shared"] = {
                    "gate": g(spp + "gate_proj.weight"),
                    "up": g(spp + "up_proj.weight"),
                    "down": g(spp + "down_proj.weight"),
                }
        else:
            lw["gate"] = g(p + "mlp.gate_proj.weight")
            lw["up"] = g(p + "mlp.up_proj.weight")
            lw["down"] = g(p + "mlp.down_proj.weight")
        return lw

    k = cfg.first_k_dense_replace
    segments = {}
    if k > 0:
        dense = [layer_weights(i, False) for i in range(k)]
        segments["dense"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dense)
    if cfg.num_layers > k:
        moe = [layer_weights(i, True) for i in range(k, cfg.num_layers)]
        segments["moe"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *moe)

    return {
        "embed": g("embed_tokens.weight"),
        "segments": segments,
        "final_norm": g("norm.weight"),
        "lm_head": (
            jnp.asarray(np.asarray(sd["lm_head.weight"], np.float32), dtype)
            if "lm_head.weight" in sd
            else None
        ),
    }
