"""Qwen3-Next hybrid GDN (gated DeltaNet) / gated-attention MoE causal LM —
the analog of the reference's GDN support (`mistralrs-core/src/gdn/`,
`models/qwen3_next.rs`).

Layer pattern (``layer_types``): 3:1 ``linear_attention`` (gated DeltaNet:
short conv + L2-normed q/k + decaying delta-rule state) to
``full_attention`` (qwen3-style GQA with an output sigmoid gate and partial
rotary), every MLP a qwen-MoE sparse block with a sigmoid-gated shared
expert. Norms are zero-centered (1 + w) RMSNorm.

The DeltaNet recurrence is a `lax.scan` over time for prefill (TPU-friendly
einsum steps; the chunked-parallel formulation is the planned perf path) and
a single fused update for decode. State cache per linear layer:
conv window [B, conv_dim, K] + recurrent state [B, n_v, d_k, d_v].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from ..ops.norms import rms_norm, rms_norm_gemma
from ..ops.rope import apply_rope, rope_cos_sin, rope_frequencies


@dataclass(frozen=True)
class Qwen3NextConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    layer_types: tuple[str, ...]
    # linear attention (GDN)
    n_v_heads: int
    n_k_heads: int
    d_k: int
    d_v: int
    conv_kernel: int
    # MoE
    num_experts: int
    num_experts_per_tok: int
    norm_topk_prob: bool
    #: layers forced to the dense MLP even when num_experts > 0 (HF
    #: `mlp_only_layers`; the reference REJECTS this field —
    #: vision_models/qwen3_5_moe/text.rs:520 "not implemented yet" — we
    #: serve it)
    mlp_only_layers: tuple = ()
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.25
    tie_word_embeddings: bool = False
    eos_token_ids: tuple[int, ...] = ()
    max_position_embeddings: int = 32768
    # qwen3.5: interleaved M-RoPE sections over the partial rotary channels
    mrope_section: tuple[int, ...] = ()

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Qwen3NextConfig":
        n_heads = d["num_attention_heads"]
        eos = d.get("eos_token_id")
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=d["num_key_value_heads"],
            head_dim=d.get("head_dim") or d["hidden_size"] // n_heads,
            layer_types=tuple(d["layer_types"]),
            n_v_heads=d["linear_num_value_heads"],
            n_k_heads=d["linear_num_key_heads"],
            d_k=d["linear_key_head_dim"],
            d_v=d["linear_value_head_dim"],
            conv_kernel=d["linear_conv_kernel_dim"],
            num_experts=d.get("num_experts", 0) or 0,
            num_experts_per_tok=d.get("num_experts_per_tok", 0) or 0,
            norm_topk_prob=d.get("norm_topk_prob", True),
            mlp_only_layers=tuple(d.get("mlp_only_layers") or ()),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10000.0),
            partial_rotary_factor=d.get("partial_rotary_factor", 0.25),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_ids=(
                tuple(eos) if isinstance(eos, (list, tuple))
                else ((eos,) if eos is not None else ())
            ),
            max_position_embeddings=d.get("max_position_embeddings", 32768),
        )

    @property
    def key_dim(self) -> int:
        return self.n_k_heads * self.d_k

    @property
    def value_dim(self) -> int:
        return self.n_v_heads * self.d_v

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim


@dataclass
class Qwen3NextCache:
    k: jax.Array  # [L_full, B, S, n_kv, hd]
    v: jax.Array
    conv: jax.Array  # [L_lin, B, conv_dim, K]
    rec: jax.Array  # [L_lin, B, n_v, d_k, d_v]

    @classmethod
    def create(cls, cfg: Qwen3NextConfig, batch: int, capacity: int,
               dtype=jnp.float32):
        n_full = sum(t == "full_attention" for t in cfg.layer_types)
        n_lin = cfg.num_layers - n_full
        return cls(
            k=jnp.zeros((n_full, batch, capacity, cfg.num_kv_heads, cfg.head_dim), dtype),
            v=jnp.zeros((n_full, batch, capacity, cfg.num_kv_heads, cfg.head_dim), dtype),
            conv=jnp.zeros((n_lin, batch, cfg.conv_dim, cfg.conv_kernel), dtype),
            rec=jnp.zeros((n_lin, batch, cfg.n_v_heads, cfg.d_k, cfg.d_v), jnp.float32),
        )


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _split_qkvz_ba(cfg: Qwen3NextConfig, qkvz, ba):
    """HF `fix_query_key_value_ordering`: per-k-head interleaved packing."""
    b, t, _ = qkvz.shape
    nk, nv = cfg.n_k_heads, cfg.n_v_heads
    r = nv // nk
    grp = qkvz.reshape(b, t, nk, 2 * cfg.d_k + 2 * r * cfg.d_v)
    q = grp[..., : cfg.d_k]
    k = grp[..., cfg.d_k : 2 * cfg.d_k]
    v = grp[..., 2 * cfg.d_k : 2 * cfg.d_k + r * cfg.d_v].reshape(b, t, nv, cfg.d_v)
    z = grp[..., 2 * cfg.d_k + r * cfg.d_v :].reshape(b, t, nv, cfg.d_v)
    bag = ba.reshape(b, t, nk, 2 * r)
    beta_in = bag[..., :r].reshape(b, t, nv)
    a_in = bag[..., r:].reshape(b, t, nv)
    return q, k, v, z, beta_in, a_in


def _delta_rule_scan(q, k, v, g, beta, state0):
    """Sequential gated delta rule. q/k: [B,T,N,dk] (L2-normed, q scaled);
    v: [B,T,N,dv]; g/beta: [B,T,N]; state0 [B,N,dk,dv] f32.
    Returns (out [B,T,N,dv], final state)."""

    def step(state, xs):
        q_t, k_t, v_t, g_t, b_t = xs  # [B,N,*]
        state = state * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bnkv,bnk->bnv", state, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        state = state + jnp.einsum("bnk,bnv->bnkv", k_t, delta)
        out_t = jnp.einsum("bnkv,bnk->bnv", state, q_t)
        return state, out_t

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (q, k, v, g, beta))
    state, outs = jax.lax.scan(step, state0, xs)
    return jnp.moveaxis(outs, 0, 1), state


def _delta_rule_scan_all(q, k, v, g, beta, state0):
    """Like `_delta_rule_scan` but also returns the state after EVERY step,
    [B, T+1, N, dk, dv] with index 0 = state0 — speculative verification
    commits the state at the accepted prefix length (the recurrent analog
    of truncating kv_len; reference speculative/cache.rs rolls caches back
    the same way)."""

    def step(state, xs):
        q_t, k_t, v_t, g_t, b_t = xs
        state = state * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bnkv,bnk->bnv", state, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        state = state + jnp.einsum("bnk,bnv->bnkv", k_t, delta)
        out_t = jnp.einsum("bnkv,bnk->bnv", state, q_t)
        return state, (out_t, state)

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (q, k, v, g, beta))
    _, (outs, states) = jax.lax.scan(step, state0, xs)
    states = jnp.concatenate(
        [state0[:, None], jnp.moveaxis(states, 0, 1)], axis=1)
    return jnp.moveaxis(outs, 0, 1), states


def _delta_rule_chunked(q, k, v, g, beta, state0, chunk: int = 64):
    """Chunk-parallel gated delta rule — the MXU formulation of
    `_delta_rule_scan` (identical math; the reference's CUDA path is fla's
    `chunk_gated_delta_rule`). Within a chunk of length L, the per-token
    deltas satisfy the unit-lower-triangular system

        (I + A) Δ = β ⊙ (V − e^{G} ⊙ (K S₀))
        A[i,j] = β_i e^{G_i − G_j} (k_i·k_j)   (j < i)

    solved with one triangular solve per chunk; outputs and the carried
    state are then plain matmuls. q/k: [B,T,N,dk]; v: [B,T,N,dv];
    g/beta: [B,T,N]; state0 [B,N,dk,dv] f32. Pads T up to a chunk multiple
    (zero β ⇒ padded rows don't disturb the state)."""
    b, t, n, dk = q.shape
    dv = v.shape[-1]
    L = min(chunk, t)
    pad = (-t) % L
    if pad:
        zpad = lambda x: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))  # noqa: E731
        q, k, v, g, beta = map(zpad, (q, k, v, g, beta))
    nc = q.shape[1] // L
    qc = jnp.transpose(q.reshape(b, nc, L, n, dk), (1, 0, 3, 2, 4))
    kc = jnp.transpose(k.reshape(b, nc, L, n, dk), (1, 0, 3, 2, 4))
    vc = jnp.transpose(v.reshape(b, nc, L, n, dv), (1, 0, 3, 2, 4))
    gc = jnp.transpose(g.reshape(b, nc, L, n), (1, 0, 3, 2))
    bc = jnp.transpose(beta.reshape(b, nc, L, n), (1, 0, 3, 2))
    tri_lower = jnp.tril(jnp.ones((L, L), bool), k=-1)
    tri_incl = jnp.tril(jnp.ones((L, L), bool))

    def chunk_step(state, xs):
        qq, kk, vv, gg, bb = xs  # [B,N,L,*]
        G = jnp.cumsum(gg, axis=-1)  # inclusive prefix log-decay
        # decay ratios e^{G_i - G_j}, masked to j ≤ i (values ≤ 1: stable)
        ratio = jnp.exp(G[..., :, None] - G[..., None, :])
        kkt = jnp.einsum("bnik,bnjk->bnij", kk, kk)
        a = jnp.where(tri_lower, ratio * kkt, 0.0) * bb[..., :, None]
        rhs = bb[..., None] * (
            vv - jnp.exp(G)[..., None] * jnp.einsum(
                "bnlk,bnkv->bnlv", kk, state
            )
        )
        from jax.scipy.linalg import solve_triangular

        delta = solve_triangular(
            jnp.eye(L) + a, rhs, lower=True, unit_diagonal=True
        )  # [B,N,L,dv]
        # outputs: o_t = e^{G_t} S₀ᵀ q_t + Σ_{i≤t} e^{G_t-G_i}(q_t·k_i) Δ_i
        qk = jnp.einsum("bntk,bnik->bnti", qq, kk)
        m = jnp.where(tri_incl, ratio * qk, 0.0)
        out = (
            jnp.exp(G)[..., None]
            * jnp.einsum("bntk,bnkv->bntv", qq, state)
            + jnp.einsum("bnti,bniv->bntv", m, delta)
        )
        # carried state: S_L = e^{G_L} S₀ + Σ_i e^{G_L-G_i} k_i Δ_iᵀ
        wts = jnp.exp(G[..., -1:] - G)  # [B,N,L]
        new_state = (
            jnp.exp(G[..., -1])[..., None, None] * state
            + jnp.einsum("bnlk,bnl,bnlv->bnkv", kk, wts, delta)
        )
        return new_state, out

    state, outs = jax.lax.scan(chunk_step, state0, (qc, kc, vc, gc, bc))
    out = jnp.transpose(outs, (1, 0, 3, 2, 4)).reshape(b, nc * L, n, dv)
    return out[:, :t], state


def _causal_conv(bx, w, kernel):
    """bx [B, T, C], w [C, K] → causal depthwise conv [B, T, C]."""
    t = bx.shape[1]
    padded = jnp.pad(bx, ((0, 0), (kernel - 1, 0), (0, 0)))
    out = jnp.zeros_like(bx)
    for j in range(kernel):
        out = out + padded[:, j : j + t, :] * w[:, j]
    return out


def _gdn_mixer(cfg: Qwen3NextConfig, lw, x, conv_state, rec_state, decode):
    b, t, _ = x.shape
    qkvz = x @ lw["in_proj_qkvz"].T
    ba = x @ lw["in_proj_ba"].T
    q, k, v, z, beta_in, a_in = _split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate(
        [q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1)], -1
    )
    w = lw["conv_w"]  # [conv_dim, K]

    if decode:
        state = jnp.concatenate(
            [conv_state[..., 1:], jnp.swapaxes(mixed, 1, 2)], axis=-1
        )
        conv_out = jnp.sum(state * w[None], axis=-1)[:, None, :]
        new_conv = state
    else:
        conv_out = _causal_conv(mixed, w, cfg.conv_kernel)
        K = cfg.conv_kernel
        new_conv = jnp.swapaxes(
            jnp.pad(mixed, ((0, 0), (K, 0), (0, 0)))[:, -K:, :], 1, 2
        )
    mixed = jax.nn.silu(conv_out)
    kd, vd = cfg.key_dim, cfg.value_dim
    q = mixed[..., :kd].reshape(b, t, cfg.n_k_heads, cfg.d_k)
    k = mixed[..., kd : 2 * kd].reshape(b, t, cfg.n_k_heads, cfg.d_k)
    v = mixed[..., 2 * kd :].reshape(b, t, cfg.n_v_heads, cfg.d_v)

    beta = jax.nn.sigmoid(beta_in.astype(jnp.float32))
    g = -jnp.exp(lw["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a_in.astype(jnp.float32) + lw["dt_bias"].astype(jnp.float32)
    )
    r = cfg.n_v_heads // cfg.n_k_heads
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    q = _l2norm(q.astype(jnp.float32)) * (cfg.d_k**-0.5)
    k = _l2norm(k.astype(jnp.float32))
    v32 = v.astype(jnp.float32)
    import os as _os

    gdn_chunk = int(_os.environ.get("MRSTPU_GDN_CHUNK", "64"))
    if t > 1 and gdn_chunk > 0:
        # chunk-parallel formulation: MXU matmuls + one triangular solve
        # per chunk instead of a length-T sequential scan
        out, new_rec = _delta_rule_chunked(
            q, k, v32, g, beta, rec_state, chunk=gdn_chunk
        )
    else:
        out, new_rec = _delta_rule_scan(q, k, v32, g, beta, rec_state)
    # gated RMSNorm (plain weight) then silu(z) gate
    normed = rms_norm(out, lw["gdn_norm"], cfg.rms_norm_eps)
    normed = normed * jax.nn.silu(z.astype(jnp.float32))
    out = normed.reshape(b, t, cfg.value_dim).astype(x.dtype)
    return out @ lw["out_proj"].T, new_conv, new_rec


def _full_attn_mixer(cfg: Qwen3NextConfig, lw, x, k_cache, v_cache, cos, sin,
                     positions, kv_start):
    b, t, _ = x.shape
    qg = (x @ lw["wq"].T).reshape(b, t, cfg.num_heads, 2 * cfg.head_dim)
    q, gate = qg[..., : cfg.head_dim], qg[..., cfg.head_dim :]
    k = (x @ lw["wk"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = (x @ lw["wv"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    q = rms_norm_gemma(q, lw["q_norm"], cfg.rms_norm_eps)
    k = rms_norm_gemma(k, lw["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    def write(cache, new):
        def one(row, new_row, start):
            return jax.lax.dynamic_update_slice(row, new_row, (start, 0, 0))

        return jax.vmap(one)(cache, new, kv_start)

    k_cache = write(k_cache, k)
    v_cache = write(v_cache, v)
    attn = sdpa(q, k_cache, v_cache, q_positions=positions, kv_len=kv_start + t)
    attn = attn * jax.nn.sigmoid(gate)
    return attn.reshape(b, t, -1) @ lw["wo"].T, k_cache, v_cache


def _moe(cfg: Qwen3NextConfig, lw, x, tp_axis=None):
    # router stays replicated: every shard ranks the GLOBAL expert set, then
    # under EP each shard computes only its local experts (global index =
    # shard offset + scan index) and the layer-level psum combines
    rl = (x @ lw["router"].T).astype(jnp.float32)
    probs = jax.nn.softmax(rl, axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    b, t, _ = x.shape
    n_global = rl.shape[-1]
    full_w = (
        jnp.zeros((b, t, n_global), jnp.float32)
        .at[jnp.arange(b)[:, None, None], jnp.arange(t)[None, :, None], topi]
        .add(topw)
    )
    n_local = lw["experts"]["gate"].shape[0]
    idx0 = (
        (jax.lax.axis_index(tp_axis) * n_local).astype(jnp.int32)
        if tp_axis is not None else jnp.int32(0)
    )

    def expert(carry, ew):
        acc, idx = carry
        y = (jax.nn.silu(x @ ew["gate"].T) * (x @ ew["up"].T)) @ ew["down"].T
        acc = acc + y * full_w[..., idx][..., None].astype(y.dtype)
        return (acc, idx + 1), None

    (out, _), _ = jax.lax.scan(
        expert, (jnp.zeros_like(x), idx0), lw["experts"]
    )
    shared = (
        jax.nn.silu(x @ lw["se_gate"].T) * (x @ lw["se_up"].T)
    ) @ lw["se_down"].T
    gate = jax.nn.sigmoid((x @ lw["shared_gate"].T).astype(jnp.float32))
    return out + shared * gate.astype(shared.dtype)


def _mlp_or_moe(cfg: Qwen3NextConfig, lw: dict, x: jax.Array,
                tp_axis=None) -> jax.Array:
    """MoE (qwen3-next) or dense silu MLP (qwen3.5 text / `mlp_only_layers`
    rows, text.rs Mlp) — keyed per LAYER by the router's presence so MoE
    and dense layers mix in one stack."""
    if "router" in lw:
        return _moe(cfg, lw, x, tp_axis)
    from ..lora import apply_lora_delta

    gate = apply_lora_delta(x @ lw["gate"].T, x, lw.get("gate_lora"))
    up = apply_lora_delta(x @ lw["up"].T, x, lw.get("up_lora"))
    hid = jax.nn.silu(gate) * up
    return apply_lora_delta(hid @ lw["down"].T, hid, lw.get("down_lora"))


def qwen3next_forward(
    weights: dict,
    cfg: Qwen3NextConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,
    cache: Qwen3NextCache,
    kv_start: jax.Array,
    *,
    decode: bool = False,
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, Qwen3NextCache]:
    h = jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv = rope_frequencies(rot, cfg.rope_theta, None)
    cos, sin = rope_cos_sin(positions, inv)

    ks, vs, convs, recs = [], [], [], []
    ai = ci = 0
    for li, lt in enumerate(cfg.layer_types):
        lw = weights["layers"][li]
        x = rms_norm_gemma(h, lw["attn_norm"], cfg.rms_norm_eps)
        if lt == "full_attention":
            out, nk, nv = _full_attn_mixer(
                cfg, lw, x, cache.k[ai], cache.v[ai], cos, sin, positions,
                kv_start,
            )
            ks.append(nk)
            vs.append(nv)
            ai += 1
        else:
            out, nconv, nrec = _gdn_mixer(
                cfg, lw, x, cache.conv[ci], cache.rec[ci], decode
            )
            convs.append(nconv)
            recs.append(nrec)
            ci += 1
        h = h + out
        x = rms_norm_gemma(h, lw["ffn_norm"], cfg.rms_norm_eps)
        h = h + _mlp_or_moe(cfg, lw, x)

    h = rms_norm_gemma(h, weights["final_norm"], cfg.rms_norm_eps)
    lm_head = weights.get("lm_head")
    if lm_head is None:
        lm_head = weights["embed"]
    logits = (h @ jnp.asarray(lm_head, compute_dtype).T).astype(jnp.float32)
    new_cache = Qwen3NextCache(
        k=jnp.stack(ks) if ks else cache.k,
        v=jnp.stack(vs) if vs else cache.v,
        conv=jnp.stack(convs) if convs else cache.conv,
        rec=jnp.stack(recs) if recs else cache.rec,
    )
    return logits, new_cache


def make_paged_cache(cfg: Qwen3NextConfig, num_blocks: int, block_size: int,
                     n_slots: int, dtype=jnp.float32, kv_quant=None,
                     groups: int = 1) -> dict:
    """Hybrid engine cache (analog of the reference's
    `kv_cache/hybrid_cache.rs`): paged KV pools for the full-attention
    layers + per-SLOT conv/recurrent state pools for the GDN layers.

    Pools carry one trailing trash row/slot for dropped writes (index -1).
    ``kv_quant`` stores the attention KV 1-byte with per-(slot, head)
    abs-max scales ("kv_scale": [n_full, S_total, 2·n_kv] — k then v lanes);
    the GDN state pools stay full-precision (recurrent error compounds).

    ``groups`` > 1 (data-parallel serving): the slot axes become
    groups × plane with per-group trailing trash — sharded over the data
    mesh axis each shard's slice ends with ITS trash row, and block/slot
    ids are group-LOCAL (same layout as kv/paged.py PagedKVCache.create)."""
    n_full = sum(t == "full_attention" for t in cfg.layer_types)
    n_lin = cfg.num_layers - n_full
    if n_slots % groups:
        raise ValueError(f"n_slots {n_slots} not divisible by groups {groups}")
    s_total = groups * (num_blocks + 1) * block_size
    slot_rows = groups * (n_slots // groups + 1)
    store = dtype
    if kv_quant:
        store = jnp.int8 if kv_quant == "int8" else jnp.float8_e4m3fn
    out = {
        "k": jnp.zeros((n_full, s_total, cfg.num_kv_heads, cfg.head_dim), store),
        "v": jnp.zeros((n_full, s_total, cfg.num_kv_heads, cfg.head_dim), store),
        "conv": jnp.zeros((n_lin, slot_rows, cfg.conv_dim, cfg.conv_kernel), dtype),
        "rec": jnp.zeros((n_lin, slot_rows, cfg.n_v_heads, cfg.d_k, cfg.d_v),
                         jnp.float32),
    }
    if kv_quant:
        out["kv_scale"] = jnp.zeros(
            (n_full, s_total, 2 * cfg.num_kv_heads), jnp.bfloat16)
    return out


def _gdn_mixer_paged(cfg, lw, x, conv_prev, rec_prev, row_len, decode,
                     capture=False):
    """GDN mixer over per-slot state with chunk continuation + pad masking.

    conv_prev [B, conv_dim, K] holds the last K inputs before this chunk
    (zeroed on reset); rec_prev [B, n_v, d_k, d_v]. row_len [B] = valid
    tokens in this chunk (0 for pad rows). Pad positions leave the
    recurrent state untouched (beta=0, g=0)."""
    b, t, _ = x.shape
    K = cfg.conv_kernel
    qkvz = x @ lw["in_proj_qkvz"].T
    ba = x @ lw["in_proj_ba"].T
    q, k, v, z, beta_in, a_in = _split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate(
        [q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1)], -1
    )
    w = lw["conv_w"]  # [conv_dim, K]
    timeline = None
    if decode and not capture:
        state = jnp.concatenate(
            [conv_prev[..., 1:], jnp.swapaxes(mixed, 1, 2)], axis=-1
        )
        conv_out = jnp.sum(state * w[None], axis=-1)[:, None, :]
        new_conv = state
    else:
        # timeline = [prev K inputs ‖ this chunk]; conv over it is exact for
        # both fresh prompts (prev = zeros) and chunk continuations
        timeline = jnp.concatenate([jnp.swapaxes(conv_prev, 1, 2), mixed], 1)
        # (in capture mode the timeline itself is returned — the commit
        # step slices the K-window at the accepted prefix length)
        conv_out = jnp.zeros_like(mixed)
        for j in range(K):
            conv_out = conv_out + timeline[:, j + 1 : j + 1 + t, :] * w[:, j]
        # new conv state = last K inputs at the row's true length
        idx = (row_len[:, None] + jnp.arange(K)[None, :])[..., None]
        new_conv = jnp.swapaxes(
            jnp.take_along_axis(timeline, idx, axis=1), 1, 2
        )
    mixed_act = jax.nn.silu(conv_out)
    kd = cfg.key_dim
    q = mixed_act[..., :kd].reshape(b, t, cfg.n_k_heads, cfg.d_k)
    k = mixed_act[..., kd : 2 * kd].reshape(b, t, cfg.n_k_heads, cfg.d_k)
    v = mixed_act[..., 2 * kd :].reshape(b, t, cfg.n_v_heads, cfg.d_v)

    valid = (jnp.arange(t)[None, :] < row_len[:, None]).astype(jnp.float32)
    beta = jax.nn.sigmoid(beta_in.astype(jnp.float32)) * valid[..., None]
    g = -jnp.exp(lw["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a_in.astype(jnp.float32) + lw["dt_bias"].astype(jnp.float32)
    )
    g = g * valid[..., None]
    r = cfg.n_v_heads // cfg.n_k_heads
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    q = _l2norm(q.astype(jnp.float32)) * (cfg.d_k**-0.5)
    k = _l2norm(k.astype(jnp.float32))
    import os as _os

    gdn_chunk = int(_os.environ.get("MRSTPU_GDN_CHUNK", "64"))
    if capture:
        # speculative verify: per-step states (γ+1 is small — the
        # sequential scan is the cheap exact path) + the conv timeline so
        # any accepted prefix length can be committed afterwards
        out, rec_states = _delta_rule_scan_all(
            q, k, v.astype(jnp.float32), g, beta, rec_prev)
        new_conv, new_rec = timeline, rec_states
    elif t > 1 and gdn_chunk > 0:
        out, new_rec = _delta_rule_chunked(
            q, k, v.astype(jnp.float32), g, beta, rec_prev, chunk=gdn_chunk
        )
    else:
        out, new_rec = _delta_rule_scan(q, k, v.astype(jnp.float32), g, beta,
                                        rec_prev)
    normed = rms_norm(out, lw["gdn_norm"], cfg.rms_norm_eps)
    normed = normed * jax.nn.silu(z.astype(jnp.float32))
    out = normed.reshape(b, t, cfg.value_dim).astype(x.dtype)
    return out @ lw["out_proj"].T, new_conv, new_rec


def qwen3next_forward_paged(
    weights: dict,
    cfg: Qwen3NextConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,  # make_paged_cache pools
    block_tables: jax.Array,  # [B, W] int32
    slot_mapping: jax.Array,  # [B, T] int32 KV write slots (< 0 → dropped)
    kv_lens: jax.Array,  # [B] lengths AFTER this step's writes
    slot_ids: jax.Array,  # [B] engine decode slot per row (< 0 → trash)
    resets: jax.Array,  # [B] 1 → zero conv/rec state before this chunk
    *,
    block_size: int,
    decode: bool = False,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,  # [B, T, H] multimodal merge
    rope_positions3: Optional[jax.Array] = None,  # [3, B, T] (qwen3.5-vl)
    deepstack: Optional[jax.Array] = None,  # [k, B, T, H] visual adds
    tp_axis: Optional[str] = None,  # shard_map mesh axis (TP serving)
    capture_states: bool = False,  # speculative verify: leave conv/rec
    # pools untouched, return per-prefix states for a later commit
    lora_scalings: Optional[jax.Array] = None,  # [B, T, A] per-request mix
):
    """Engine-servable hybrid step (prefill chunk or decode): paged KV for
    full-attention layers, slot-keyed conv/recurrent pools for GDN layers.
    Mirrors `forward_paged` (models/llama.py) batch/slot/table conventions;
    the reference serves this arch via the Pipeline trait + hybrid cache
    (`mistralrs-core/src/kv_cache/hybrid_cache.rs`). The qwen3.5-vl
    extensions (merged embeds, interleaved M-RoPE over the partial rotary
    channels, DeepStack adds after the first k layers) ride the same step
    (`vision_models/qwen3_5/text.rs`)."""
    b, t = input_ids.shape
    if input_embeds is not None:
        h = input_embeds.astype(compute_dtype)
    else:
        h = jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv = rope_frequencies(rot, cfg.rope_theta, None)
    if rope_positions3 is not None and cfg.mrope_section:
        from ..ops.rope import mrope_cos_sin_interleaved

        cos, sin = mrope_cos_sin_interleaved(
            rope_positions3, inv, cfg.mrope_section
        )
    else:
        cos, sin = rope_cos_sin(positions, inv)

    n_lin = cache["conv"].shape[0]
    trash_slot = cache["conv"].shape[1] - 1
    slot_safe = jnp.where(slot_ids < 0, trash_slot, slot_ids)
    reset_keep = (1.0 - resets.astype(jnp.float32))
    if last_indices is not None:
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
    aux_timeline: list = []
    aux_rec: list = []
    ai = ci = 0
    from ..lora import apply_lora_delta

    for li, lt in enumerate(cfg.layer_types):
        lw = weights["layers"][li]
        if lora_scalings is not None:
            # per-request adapter mix on this layer's bank entries (same
            # one-hot X-LoRA path as forward_paged, models/llama.py)
            lw = {
                k: (dict(v, xlora_scalings=lora_scalings)
                    if k.endswith("_lora") and isinstance(v, dict)
                    and "xlora_scalings" not in v else v)
                for k, v in lw.items()
            }
        x = rms_norm_gemma(h, lw["attn_norm"], cfg.rms_norm_eps)
        if lt == "full_attention":
            qg_flat = apply_lora_delta(x @ lw["wq"].T, x, lw.get("wq_lora"))
            qg = qg_flat.reshape(b, t, cfg.num_heads, 2 * cfg.head_dim)
            q, gate = qg[..., : cfg.head_dim], qg[..., cfg.head_dim :]
            k = apply_lora_delta(x @ lw["wk"].T, x, lw.get("wk_lora")).reshape(
                b, t, cfg.num_kv_heads, cfg.head_dim)
            v = apply_lora_delta(x @ lw["wv"].T, x, lw.get("wv_lora")).reshape(
                b, t, cfg.num_kv_heads, cfg.head_dim)
            q = rms_norm_gemma(q, lw["q_norm"], cfg.rms_norm_eps)
            k = rms_norm_gemma(k, lw["k_norm"], cfg.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            k_rows = k.reshape(b * t, cfg.num_kv_heads, cfg.head_dim)
            v_rows = v.reshape(b * t, cfg.num_kv_heads, cfg.head_dim)
            if "kv_scale" in new_cache:  # 1-byte pools, per-(slot,head) scale
                cap = 127.0 if new_cache["k"].dtype == jnp.int8 else 448.0

                def qenc(x):
                    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
                    sc = amax / cap
                    enc = x.astype(jnp.float32) / jnp.maximum(
                        sc, 1e-10)[..., None]
                    if new_cache["k"].dtype == jnp.int8:
                        enc = jnp.clip(jnp.round(enc), -127, 127)
                    return enc, sc

                k_enc, k_sc = qenc(k_rows)
                v_enc, v_sc = qenc(v_rows)
                kp = new_cache["k"].at[ai, flat_slots].set(
                    k_enc.astype(new_cache["k"].dtype))
                vp = new_cache["v"].at[ai, flat_slots].set(
                    v_enc.astype(new_cache["v"].dtype))
                sc_rows = jnp.concatenate([k_sc, v_sc], axis=-1)
                new_cache["kv_scale"] = new_cache["kv_scale"].at[
                    ai, flat_slots].set(sc_rows.astype(jnp.bfloat16))
                new_cache["k"], new_cache["v"] = kp, vp
                sg = new_cache["kv_scale"][ai][gather_slots].astype(
                    jnp.float32)  # [B, S, 2·n_kv]
                nkv = cfg.num_kv_heads
                kk = (kp[ai][gather_slots].astype(jnp.float32)
                      * sg[..., :nkv, None]).astype(compute_dtype)
                vv = (vp[ai][gather_slots].astype(jnp.float32)
                      * sg[..., nkv:, None]).astype(compute_dtype)
            else:
                kp = new_cache["k"].at[ai, flat_slots].set(
                    k_rows.astype(new_cache["k"].dtype))
                vp = new_cache["v"].at[ai, flat_slots].set(
                    v_rows.astype(new_cache["v"].dtype))
                new_cache["k"], new_cache["v"] = kp, vp
                kk = kp[ai][gather_slots].astype(compute_dtype)  # [B,S,n_kv,hd]
                vv = vp[ai][gather_slots].astype(compute_dtype)
            attn = sdpa(q, kk, vv, q_positions=positions, kv_len=kv_lens)
            attn = attn * jax.nn.sigmoid(gate)
            attn_flat = attn.reshape(b, t, -1)
            out = apply_lora_delta(
                attn_flat @ lw["wo"].T, attn_flat, lw.get("wo_lora")
            )
            ai += 1
        else:
            conv_prev = (
                new_cache["conv"][ci][slot_safe]
                * reset_keep[:, None, None].astype(new_cache["conv"].dtype)
            )
            rec_prev = new_cache["rec"][ci][slot_safe] * reset_keep[:, None, None, None]
            out, nconv, nrec = _gdn_mixer_paged(
                cfg, lw, x, conv_prev, rec_prev, row_len, decode,
                capture=capture_states,
            )
            if capture_states:
                aux_timeline.append(nconv)  # [B, K+T, conv_dim]
                aux_rec.append(nrec)  # [B, T+1, N, dk, dv]
            else:
                new_cache["conv"] = new_cache["conv"].at[ci, slot_safe].set(
                    nconv.astype(new_cache["conv"].dtype)
                )
                new_cache["rec"] = new_cache["rec"].at[ci, slot_safe].set(nrec)
            ci += 1
        if tp_axis is not None:
            out = jax.lax.psum(out, tp_axis)  # row-parallel wo/out_proj
        h = h + out
        x = rms_norm_gemma(h, lw["ffn_norm"], cfg.rms_norm_eps)
        ffn = _mlp_or_moe(cfg, lw, x, tp_axis)
        if tp_axis is not None:
            ffn = jax.lax.psum(ffn, tp_axis)  # row-parallel down + EP combine
        h = h + ffn
        if deepstack is not None and li < deepstack.shape[0]:
            h = h + deepstack[li].astype(h.dtype)

    h = rms_norm_gemma(h, weights["final_norm"], cfg.rms_norm_eps)
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
    if capture_states:
        aux = {
            "timeline": jnp.stack(aux_timeline),  # [n_lin, B, K+T, conv_dim]
            "rec": jnp.stack(aux_rec),  # [n_lin, B, T+1, N, dk, dv]
        }
        return logits, new_cache, aux
    return logits, new_cache


def commit_verified_states(cfg, cache, aux, slot_ids, n_commit):
    """Write the GDN state at each row's accepted prefix length into the
    per-slot pools: conv = the K-window of the timeline ending at token
    n_commit, rec = the per-step state after n_commit tokens. n_commit = 0
    (or slot < 0) leaves the slot's state unchanged by writing back its own
    pre-verify values (timeline[0:K] / rec[0])."""
    K = cfg.conv_kernel
    trash = cache["conv"].shape[1] - 1
    slot_safe = jnp.where(slot_ids < 0, trash, slot_ids)
    n = jnp.maximum(jnp.where(slot_ids < 0, 0, n_commit), 0)
    tl = aux["timeline"]  # [n_lin, B, K+T, conv_dim]
    idx = (n[None, :, None] + jnp.arange(K)[None, None, :])[..., None]
    conv = jnp.take_along_axis(tl, idx, axis=2)  # [n_lin, B, K, conv_dim]
    conv = jnp.swapaxes(conv, 2, 3)  # [n_lin, B, conv_dim, K]
    rec = jnp.take_along_axis(
        aux["rec"], n[None, :, None, None, None, None], axis=2
    )[:, :, 0]  # [n_lin, B, N, dk, dv]
    new_cache = dict(cache)
    new_cache["conv"] = cache["conv"].at[:, slot_safe].set(
        conv.astype(cache["conv"].dtype)
    )
    new_cache["rec"] = cache["rec"].at[:, slot_safe].set(rec)
    return new_cache


def qwen3next_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen3NextConfig, dtype=jnp.float32
) -> dict:
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        arr = sd.get(pre + name)
        return None if arr is None else jnp.asarray(arr, dtype)

    layers = []
    for i, lt in enumerate(cfg.layer_types):
        p = f"layers.{i}."
        lw: dict[str, Any] = {
            "attn_norm": g(p + "input_layernorm.weight"),
            "ffn_norm": g(p + "post_attention_layernorm.weight"),
        }
        if cfg.num_experts > 0 and i not in cfg.mlp_only_layers:
            lw.update(
                router=g(p + "mlp.gate.weight"),
                se_gate=g(p + "mlp.shared_expert.gate_proj.weight"),
                se_up=g(p + "mlp.shared_expert.up_proj.weight"),
                se_down=g(p + "mlp.shared_expert.down_proj.weight"),
                shared_gate=g(p + "mlp.shared_expert_gate.weight"),
                experts={
                    key: jnp.stack(
                        [
                            g(p + f"mlp.experts.{e}.{hf}.weight")
                            for e in range(cfg.num_experts)
                        ]
                    )
                    for key, hf in (
                        ("gate", "gate_proj"), ("up", "up_proj"),
                        ("down", "down_proj"),
                    )
                },
            )
        else:  # qwen3.5 dense MLP
            lw.update(
                gate=g(p + "mlp.gate_proj.weight"),
                up=g(p + "mlp.up_proj.weight"),
                down=g(p + "mlp.down_proj.weight"),
            )
        if lt == "full_attention":
            lw.update(
                wq=g(p + "self_attn.q_proj.weight"),
                wk=g(p + "self_attn.k_proj.weight"),
                wv=g(p + "self_attn.v_proj.weight"),
                wo=g(p + "self_attn.o_proj.weight"),
                q_norm=g(p + "self_attn.q_norm.weight"),
                k_norm=g(p + "self_attn.k_norm.weight"),
            )
        else:
            conv_w = g(p + "linear_attn.conv1d.weight")  # [conv_dim, 1, K]
            lw.update(
                in_proj_qkvz=g(p + "linear_attn.in_proj_qkvz.weight"),
                in_proj_ba=g(p + "linear_attn.in_proj_ba.weight"),
                conv_w=conv_w.reshape(cfg.conv_dim, cfg.conv_kernel),
                A_log=g(p + "linear_attn.A_log"),
                dt_bias=g(p + "linear_attn.dt_bias"),
                gdn_norm=g(p + "linear_attn.norm.weight"),
                out_proj=g(p + "linear_attn.out_proj.weight"),
            )
        layers.append(lw)
    return {
        "embed": g("embed_tokens.weight"),
        "layers": layers,
        "final_norm": g("norm.weight"),
        "lm_head": (
            None if cfg.tie_word_embeddings
            else jnp.asarray(sd["lm_head.weight"], dtype)
        ),
    }


def qwen3next_greedy_generate(
    weights: dict, cfg: Qwen3NextConfig, prompt_ids, max_new_tokens: int = 16,
) -> list[int]:
    ids = jnp.asarray(np.asarray(prompt_ids, np.int32)[None])
    t0 = ids.shape[1]
    cache = Qwen3NextCache.create(cfg, 1, t0 + max_new_tokens)
    positions = jnp.arange(t0, dtype=jnp.int32)[None]
    logits, cache = qwen3next_forward(
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
        logits, cache = qwen3next_forward(
            weights, cfg, tok[None].astype(jnp.int32), pos, cache,
            jnp.asarray([t0 + step], jnp.int32), decode=True,
        )
        tok = jnp.argmax(logits[:, -1], axis=-1)
    return out


# -- mesh (TP) serving support ----------------------------------------------
# The analog of the reference's every-model TP (`mistralrs-quant/src/
# distributed/layers.rs:58` used from models/qwen3_next.rs): column-shard
# the projections on heads, shard the GDN conv window / delta-rule state on
# heads, EP-shard the expert bank, and psum at the row-parallel boundaries
# (see tp_axis in qwen3next_forward_paged).


def q3n_local_config(cfg: Qwen3NextConfig, tp: int) -> Qwen3NextConfig:
    """Per-shard config: attention + GDN heads and the expert count divide."""
    if tp == 1:
        return cfg
    import dataclasses

    for dim, name in (
        (cfg.num_heads, "num_heads"), (cfg.num_kv_heads, "num_kv_heads"),
        (cfg.n_k_heads, "n_k_heads"), (cfg.n_v_heads, "n_v_heads"),
    ):
        if dim % tp:
            raise ValueError(f"tp={tp} does not divide {name}={dim}")
    if cfg.num_experts and cfg.num_experts % tp:
        raise ValueError(f"tp={tp} does not divide num_experts={cfg.num_experts}")
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        n_k_heads=cfg.n_k_heads // tp,
        n_v_heads=cfg.n_v_heads // tp,
        num_experts=cfg.num_experts // tp if cfg.num_experts else 0,
    )


def permute_gdn_conv_for_tp(weights: dict, cfg: Qwen3NextConfig, tp: int) -> dict:
    """Reorder conv1d rows from the global [q‖k‖v] concat layout to
    shard-major [q_i‖k_i‖v_i]*tp so a contiguous row shard is each rank's
    local conv over its own heads (the conv state pool follows the local
    layout automatically — it is produced shard-locally)."""
    if tp == 1:
        return weights
    kd, vd = cfg.key_dim, cfg.value_dim
    kq, vq = kd // tp, vd // tp
    idx = []
    for i in range(tp):
        idx += list(range(i * kq, (i + 1) * kq))
        idx += list(range(kd + i * kq, kd + (i + 1) * kq))
        idx += list(range(2 * kd + i * vq, 2 * kd + (i + 1) * vq))
    idx = np.asarray(idx)
    new_layers = []
    for lw in weights["layers"]:
        if "conv_w" in lw:
            lw = dict(lw, conv_w=lw["conv_w"][idx])
        new_layers.append(lw)
    return dict(weights, layers=new_layers)


def q3n_weight_pspecs(weights: dict, tp_axis: str = "model") -> dict:
    """PartitionSpec pytree matching qwen3next weights (apply
    permute_gdn_conv_for_tp FIRST — conv_w specs assume shard-major rows)."""
    from jax.sharding import PartitionSpec as P

    col, row, rep = P(tp_axis, None), P(None, tp_axis), P()
    per_key = {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "in_proj_qkvz": col, "in_proj_ba": col, "conv_w": col,
        "out_proj": row, "A_log": P(tp_axis), "dt_bias": P(tp_axis),
        "se_gate": col, "se_up": col, "se_down": row,
        "gate": col, "up": col, "down": row,
    }
    layers = []
    for lw in weights["layers"]:
        d = {}
        for key, w in lw.items():
            if w is None:
                d[key] = None
            elif key == "experts":
                d[key] = {k2: P(tp_axis, None, None) for k2 in w}
            else:
                d[key] = per_key.get(key, rep)
        layers.append(d)
    return {
        "embed": rep,
        "layers": layers,
        "final_norm": rep,
        "lm_head": rep if weights.get("lm_head") is not None else None,
    }


def q3n_cache_pspecs(tp_axis: str = "model", dp_axis=None) -> dict:
    """Hybrid cache pspecs: KV pools shard on kv-heads, conv on the (shard-
    major) conv rows, recurrent state on value heads. With ``dp_axis`` the
    slot axes shard over the data axis too (group-local ids + per-group
    trash, make_paged_cache groups=dp)."""
    from jax.sharding import PartitionSpec as P

    return {
        "k": P(None, dp_axis, tp_axis, None),  # [L_full, S, n_kv, hd]
        "v": P(None, dp_axis, tp_axis, None),
        "conv": P(None, dp_axis, tp_axis, None),  # [L_lin, slots, conv_dim, K]
        "rec": P(None, dp_axis, tp_axis, None, None),  # [L_lin, slots, n_v, dk, dv]
    }
