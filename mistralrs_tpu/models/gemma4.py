"""Gemma 4 text core — the analog of the reference's
`mistralrs-core/src/vision_models/gemma4/text.rs` (causal decoding path;
the diffusion-canvas and MTP heads are out of scope):

* sliding/full layer pattern with DIFFERENT head geometry per type — full
  layers use ``global_head_dim`` (and optional ``num_global_key_value_heads``)
  with PROPORTIONAL partial RoPE (inv-freqs over head_dim as denominator,
  zero-padded so untouched channels pass through), sliding layers use the
  local theta with full rotary;
* q/k RMS norms (+ v RMS norm) applied BEFORE rope, softmax scale 1.0;
* optional ``attention_k_eq_v`` on full layers (no v_proj: v = norm(k));
* KV sharing (gemma3n-style same-type donors) with per-type paged pools;
* sandwich norms with residual-side normalization
  (out = residual + rms(branch), optionally × a learned ``layer_scalar``);
* per-layer-input embeddings (gemma3n PLE) and optional MoE blocks that run
  IN PARALLEL with the dense MLP (router = rms-normed logits clipped to
  ±1e4, softmax top-k renormalized × per_expert_scale);
* ``use_double_wide_mlp``: KV-shared layers get a 2× intermediate MLP.

No public checkpoints or transformers class exist for this architecture,
so tests are structural (reference-algorithm invariants on a synthetic
checkpoint) rather than HF parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa


def _rms(x, w=None, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if w is not None:
        n = n * w.astype(jnp.float32)
    return n.astype(x.dtype)


@dataclass(frozen=True)
class Gemma4Config:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    global_head_dim: int
    num_global_kv_heads: int
    layer_types: tuple[str, ...]
    sliding_window: int
    num_kv_shared_layers: int
    attention_k_eq_v: bool
    use_double_wide_mlp: bool
    hidden_size_per_layer_input: int
    vocab_size_per_layer_input: int
    enable_moe_block: bool
    num_experts: int
    top_k_experts: int
    expert_intermediate_size: int
    rope_theta: float
    rope_local_theta: float
    partial_rotary_factor: float
    rms_norm_eps: float
    final_logit_softcap: Optional[float]
    hidden_act: str = "gelu_pytorch_tanh"
    tie_word_embeddings: bool = True
    eos_token_ids: tuple[int, ...] = ()
    arch: str = "gemma4"

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Gemma4Config":
        tc = dict(d.get("text_config", d))
        rp = tc.get("rope_parameters") or {}
        fa = rp.get("full_attention") or {}
        sa = rp.get("sliding_attention") or {}
        n = tc["num_hidden_layers"]
        pattern = tc.get("sliding_window_pattern", 6)
        layer_types = tuple(
            tc.get("layer_types")
            or [
                "full_attention" if (i + 1) % pattern == 0
                else "sliding_attention"
                for i in range(n)
            ]
        )
        eos = tc.get("eos_token_id")
        return cls(
            vocab_size=tc["vocab_size"],
            hidden_size=tc["hidden_size"],
            intermediate_size=tc["intermediate_size"],
            num_layers=n,
            num_heads=tc["num_attention_heads"],
            num_kv_heads=tc["num_key_value_heads"],
            head_dim=tc["head_dim"],
            global_head_dim=tc.get("global_head_dim", 512),
            num_global_kv_heads=tc.get("num_global_key_value_heads")
            or tc["num_key_value_heads"],
            layer_types=layer_types,
            sliding_window=tc.get("sliding_window", 512),
            num_kv_shared_layers=tc.get("num_kv_shared_layers", 0),
            attention_k_eq_v=tc.get("attention_k_eq_v", False),
            use_double_wide_mlp=tc.get("use_double_wide_mlp", False),
            hidden_size_per_layer_input=tc.get("hidden_size_per_layer_input")
            or 0,
            vocab_size_per_layer_input=tc.get("vocab_size_per_layer_input")
            or tc["vocab_size"],
            enable_moe_block=tc.get("enable_moe_block", False),
            num_experts=tc.get("num_experts") or 128,
            top_k_experts=tc.get("top_k_experts") or 2,
            expert_intermediate_size=tc.get("expert_intermediate_size")
            or tc.get("moe_intermediate_size")
            or tc["intermediate_size"],
            rope_theta=fa.get("rope_theta", tc.get("rope_theta", 1_000_000.0)),
            rope_local_theta=sa.get(
                "rope_theta", tc.get("rope_local_base_freq", 10_000.0)
            ),
            partial_rotary_factor=fa.get("partial_rotary_factor", 0.25),
            rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
            final_logit_softcap=tc.get("final_logit_softcapping"),
            hidden_act=tc.get("hidden_activation", "gelu_pytorch_tanh"),
            tie_word_embeddings=tc.get("tie_word_embeddings", True),
            eos_token_ids=(
                tuple(eos) if isinstance(eos, (list, tuple))
                else ((eos,) if eos is not None else ())
            ),
        )

    @property
    def first_shared_layer(self) -> int:
        return self.num_layers - self.num_kv_shared_layers

    def kv_plan(self) -> tuple[list[int], list[bool]]:
        """(plane index per layer, writes-KV per layer): shared layers map
        to the last non-shared layer of the same type (text.rs:55-70).
        Planes are numbered per TYPE group: sliding planes then full planes
        (the two paged pools have different geometry)."""
        first = self.first_shared_layer
        plane_of_store: dict[int, int] = {}
        counters = {"sliding_attention": 0, "full_attention": 0}
        planes, writes = [], []
        for li in range(self.num_layers):
            lt = self.layer_types[li]
            if li < first or self.num_kv_shared_layers <= 0:
                plane_of_store[li] = counters[lt]
                counters[lt] += 1
                planes.append(plane_of_store[li])
                writes.append(True)
            else:
                prev = self.layer_types[:first]
                src = len(prev) - 1 - prev[::-1].index(lt)
                planes.append(plane_of_store[src])
                writes.append(False)
        return planes, writes

    def num_kv_planes(self, layer_type: str) -> int:
        first = (
            self.first_shared_layer if self.num_kv_shared_layers > 0
            else self.num_layers
        )
        return sum(1 for t in self.layer_types[:first] if t == layer_type)

    # engine-facing aliases
    @property
    def max_position_embeddings(self) -> int:
        return 32768

    @property
    def embedding_multiplier(self):
        return None


def _mlp_inter(cfg: Gemma4Config, li: int) -> int:
    shared = cfg.num_kv_shared_layers > 0 and li >= cfg.first_shared_layer
    if cfg.use_double_wide_mlp and shared:
        return cfg.intermediate_size * 2
    return cfg.intermediate_size


def gemma4_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Gemma4Config, dtype=jnp.float32
) -> dict:
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name, optional=False):
        arr = sd.get(pre + name)
        if arr is None:
            if optional:
                return None
            raise KeyError(pre + name)
        return jnp.asarray(np.asarray(arr, np.float32), dtype)

    planes, writes = cfg.kv_plan()
    layers = []
    for i, lt in enumerate(cfg.layer_types):
        p = f"layers.{i}."
        lw: dict[str, Any] = {
            "wq": g(p + "self_attn.q_proj.weight"),
            "wo": g(p + "self_attn.o_proj.weight"),
            "q_norm": g(p + "self_attn.q_norm.weight"),
            "attn_norm": g(p + "input_layernorm.weight"),
            "post_attn_norm": g(p + "post_attention_layernorm.weight"),
            "pre_ffn_norm": g(p + "pre_feedforward_layernorm.weight"),
            "post_ffn_norm": g(p + "post_feedforward_layernorm.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
            "layer_scalar": g(p + "layer_scalar", optional=True),
        }
        if writes[i]:
            lw.update(
                wk=g(p + "self_attn.k_proj.weight"),
                k_norm=g(p + "self_attn.k_norm.weight"),
                v_norm=g(p + "self_attn.v_norm.weight", optional=True),
            )
            k_eq_v = cfg.attention_k_eq_v and lt == "full_attention"
            if not k_eq_v:
                lw["wv"] = g(p + "self_attn.v_proj.weight")
        if cfg.hidden_size_per_layer_input > 0:
            lw.update(
                pli_gate=g(p + "per_layer_input_gate.weight"),
                pli_proj=g(p + "per_layer_projection.weight"),
                pli_norm=g(p + "post_per_layer_input_norm.weight"),
            )
        if cfg.enable_moe_block:
            lw.update(
                router_scale=g(p + "router.scale"),
                router_proj=g(p + "router.proj.weight"),
                per_expert_scale=(
                    g(p + "experts.per_expert_scale", optional=True)
                    if pre + p + "experts.per_expert_scale" in sd
                    else g(p + "moe.per_expert_scale")
                ),
                moe_gate_up=(
                    g(p + "experts.gate_up_proj", optional=True)
                    if pre + p + "experts.gate_up_proj" in sd
                    else g(p + "moe.gate_up_proj")
                ),  # [E, H, 2I]
                moe_down=(
                    g(p + "experts.down_proj", optional=True)
                    if pre + p + "experts.down_proj" in sd
                    else g(p + "moe.down_proj")
                ),  # [E, I, H]
                pre_ffn_norm_2=g(p + "pre_feedforward_layernorm_2.weight"),
                post_ffn_norm_1=g(p + "post_feedforward_layernorm_1.weight"),
                post_ffn_norm_2=g(p + "post_feedforward_layernorm_2.weight"),
            )
        layers.append(lw)
    out = {
        "embed": g("embed_tokens.weight"),
        "final_norm": g("norm.weight"),
        "layers": layers,
        "lm_head": (
            None if cfg.tie_word_embeddings
            else jnp.asarray(sd["lm_head.weight"], dtype)
        ),
    }
    if cfg.hidden_size_per_layer_input > 0:
        out.update(
            embed_per_layer=g("embed_tokens_per_layer.weight"),
            pl_projection=g("per_layer_model_projection.weight"),
            pl_projection_norm=g("per_layer_projection_norm.weight"),
        )
    return out


def make_paged_cache(
    cfg: Gemma4Config, num_blocks: int, block_size: int, n_slots: int = 0,
    dtype=jnp.float32,
) -> dict:
    # +1 trash block: dropped writes (slot −1) scatter into it (write_kv
    # routes them to the last slot) without touching allocatable blocks
    slots = (num_blocks + 1) * block_size
    return {
        "k_s": jnp.zeros(
            (cfg.num_kv_planes("sliding_attention"), cfg.num_kv_heads,
             slots, cfg.head_dim), dtype,
        ),
        "v_s": jnp.zeros(
            (cfg.num_kv_planes("sliding_attention"), cfg.num_kv_heads,
             slots, cfg.head_dim), dtype,
        ),
        "k_f": jnp.zeros(
            (cfg.num_kv_planes("full_attention"), cfg.num_global_kv_heads,
             slots, cfg.global_head_dim), dtype,
        ),
        "v_f": jnp.zeros(
            (cfg.num_kv_planes("full_attention"), cfg.num_global_kv_heads,
             slots, cfg.global_head_dim), dtype,
        ),
    }


def _proportional_rope(positions, head_dim: int, rope_angles: int, theta):
    """cos/sin [B, T, head_dim//2] with zero inv-freq past rope_angles —
    the standard rotate-half formula then leaves those channels identical
    (ProportionalRotaryEmbedding, text.rs:93-138)."""
    half = head_dim // 2
    inv = np.zeros((half,), np.float32)
    inv[:rope_angles] = 1.0 / (
        theta ** (2.0 * np.arange(rope_angles) / head_dim)
    )
    ang = positions.astype(jnp.float32)[..., None] * inv
    return jnp.cos(ang), jnp.sin(ang)


def _rope_half(x, cos, sin):
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    return jnp.concatenate(
        [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
    ).astype(x.dtype)


def _moe_parallel(cfg: Gemma4Config, lw, xs, pre_ff_normed, eps, act):
    """MoE layers: dense MLP and routed experts run in PARALLEL with
    separate sandwich norms, summed, then post_ffn_norm (text.rs:1186-1224)."""
    mlp = (act(pre_ff_normed @ lw["gate"].T) * (pre_ff_normed @ lw["up"].T)) @ lw["down"].T
    mlp_normed = _rms(mlp, lw["post_ffn_norm_1"], eps)
    # router: rms with combined weight scale·H^-0.5, logits clipped
    router_w = lw["router_scale"].astype(jnp.float32) * (
        cfg.hidden_size ** -0.5
    )
    normed_in = _rms(xs, None, eps) * router_w.astype(xs.dtype)
    logits = jnp.clip(
        (normed_in @ lw["router_proj"].T).astype(jnp.float32), -1e4, 1e4
    )
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.top_k_experts)
    topw = topw / jnp.maximum(jnp.sum(topw, -1, keepdims=True), 1e-20)
    pes = lw["per_expert_scale"].astype(jnp.float32)
    topw = topw * jnp.take(pes, topi)
    b, t, _ = xs.shape
    full_w = (
        jnp.zeros((b, t, cfg.num_experts), jnp.float32)
        .at[jnp.arange(b)[:, None, None], jnp.arange(t)[None, :, None], topi]
        .add(topw)
    )
    moe_in = _rms(xs, lw["pre_ffn_norm_2"], eps)
    inter = cfg.expert_intermediate_size

    def expert(carry, ew):
        acc, idx = carry
        gu, dn = ew  # [H, 2I], [I, H]
        h = moe_in @ gu
        y = (act(h[..., :inter]) * h[..., inter:]) @ dn
        acc = acc + y * full_w[..., idx][..., None].astype(y.dtype)
        return (acc, idx + 1), None

    (moe_out, _), _ = jax.lax.scan(
        expert, (jnp.zeros_like(xs), jnp.int32(0)),
        (lw["moe_gate_up"], lw["moe_down"]),
    )
    moe_normed = _rms(moe_out, lw["post_ffn_norm_2"], eps)
    return _rms(mlp_normed + moe_normed, lw["post_ffn_norm"], eps)


def gemma4_forward_paged(
    weights: dict,
    cfg: Gemma4Config,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,
    block_tables: jax.Array,  # [B, W]
    slot_mapping: jax.Array,  # [B, T] (< 0 → dropped)
    kv_lens: jax.Array,  # [B]
    *,
    block_size: int,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,
):
    from ..kv.paged import gather_kv, write_kv
    from .llama import ACTIVATIONS

    eps = cfg.rms_norm_eps
    act = ACTIVATIONS[cfg.hidden_act]
    b, t = input_ids.shape
    if input_embeds is not None:
        h = input_embeds.astype(compute_dtype)
    else:
        h = (
            weights["embed"].astype(compute_dtype)[input_ids]
            * jnp.asarray(cfg.hidden_size ** 0.5, compute_dtype)
        )

    per_layer_inputs = None
    if cfg.hidden_size_per_layer_input > 0:
        pl = cfg.hidden_size_per_layer_input
        pl_ids = jnp.where(
            (input_ids >= 0) & (input_ids < cfg.vocab_size_per_layer_input),
            input_ids, 0,
        )
        pli_embed = (
            weights["embed_per_layer"].astype(compute_dtype)[pl_ids]
            * jnp.asarray(pl ** 0.5, compute_dtype)
        ).reshape(b, t, cfg.num_layers, pl)
        proj = (h @ weights["pl_projection"].T) * (cfg.hidden_size ** -0.5)
        proj = _rms(
            proj.reshape(b, t, cfg.num_layers, pl),
            weights["pl_projection_norm"], eps,
        )
        per_layer_inputs = (proj + pli_embed) * jnp.asarray(
            2.0 ** -0.5, compute_dtype
        )

    rope_angles = int(cfg.global_head_dim * cfg.partial_rotary_factor / 2.0)
    cos_g, sin_g = _proportional_rope(
        positions, cfg.global_head_dim, rope_angles, cfg.rope_theta
    )
    inv_l = 1.0 / (
        cfg.rope_local_theta
        ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim)
    )
    ang_l = positions.astype(jnp.float32)[..., None] * inv_l
    cos_l, sin_l = jnp.cos(ang_l), jnp.sin(ang_l)

    planes, writes = cfg.kv_plan()
    flat_slots = slot_mapping.reshape(-1)
    pools = {k: v for k, v in cache.items()}

    for li, lw in enumerate(weights["layers"]):
        sliding = cfg.layer_types[li] == "sliding_attention"
        hd = cfg.head_dim if sliding else cfg.global_head_dim
        n_kv = cfg.num_kv_heads if sliding else cfg.num_global_kv_heads
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
        kk_key, vv_key = ("k_s", "v_s") if sliding else ("k_f", "v_f")
        plane = planes[li]
        residual = h
        x = _rms(h, lw["attn_norm"], eps)
        q = (x @ lw["wq"].T).reshape(b, t, cfg.num_heads, hd)
        q = _rms(q, lw["q_norm"], eps)
        q = _rope_half(q, cos, sin)
        if writes[li]:
            k = (x @ lw["wk"].T).reshape(b, t, n_kv, hd)
            k = _rms(k, lw["k_norm"], eps)
            if "wv" in lw:
                v = (x @ lw["wv"].T).reshape(b, t, n_kv, hd)
            else:  # attention_k_eq_v: v shares the k projection
                v = k
            v = _rms(v, lw.get("v_norm"), eps)
            k = _rope_half(k, cos, sin)
            k_c, v_c, _ = write_kv(
                pools[kk_key][plane], pools[vv_key][plane],
                k.reshape(b * t, n_kv, hd), v.reshape(b * t, n_kv, hd),
                flat_slots,
            )
            pools[kk_key] = pools[kk_key].at[plane].set(k_c)
            pools[vv_key] = pools[vv_key].at[plane].set(v_c)
        kk, vv = gather_kv(
            pools[kk_key][plane], pools[vv_key][plane], block_tables,
            block_size, dtype=compute_dtype,
        )
        attn = sdpa(
            q, kk, vv, q_positions=positions, kv_len=kv_lens, scale=1.0,
            sliding_window=cfg.sliding_window if sliding else None,
        )
        attn = attn.reshape(b, t, cfg.num_heads * hd) @ lw["wo"].T
        # post_attn = residual + rms(attn); then pre-ff norm
        xs = residual + _rms(attn, lw["post_attn_norm"], eps)
        pre_ff = _rms(xs, lw["pre_ffn_norm"], eps)
        if cfg.enable_moe_block:
            h = xs + _moe_parallel(cfg, lw, xs, pre_ff, eps, act)
        else:
            mlp = (act(pre_ff @ lw["gate"].T) * (pre_ff @ lw["up"].T)) @ lw[
                "down"
            ].T
            h = xs + _rms(mlp, lw["post_ffn_norm"], eps)
        if per_layer_inputs is not None:
            res_ple = h
            gated = act(h @ lw["pli_gate"].T) * per_layer_inputs[:, :, li]
            h = res_ple + _rms(gated @ lw["pli_proj"].T, lw["pli_norm"], eps)
        if lw.get("layer_scalar") is not None:
            h = h * lw["layer_scalar"].astype(h.dtype)

    h = _rms(h, weights["final_norm"], eps)
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
    logits = (h @ lm_head.T.astype(compute_dtype)).astype(jnp.float32)
    if cfg.final_logit_softcap:
        logits = (
            jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
        )
    return logits, pools
