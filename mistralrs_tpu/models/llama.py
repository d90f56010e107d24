"""Llama-superfamily causal LM — covers llama/mistral/qwen2/qwen3/gemma2/
gemma3/phi3/smollm3/starcoder2 and (with experts) mixtral/qwen3moe.

The analog of the reference's per-arch model files
(`mistralrs-core/src/models/llama.rs:66-231` etc.), collapsed into one
functional TPU-idiomatic implementation:

* Weights are a pytree; per-layer weights are **stacked** along a leading
  layer axis and the decoder runs as one `lax.scan` — one compiled layer body
  regardless of depth (the XLA analog of the reference's CUDA-graph reuse).
* Quantized layers are `QTensor` pytrees, so the scan slices their packed
  codes + scales per layer automatically.
* The KV cache is a fixed-capacity carried tensor pair updated with
  per-sequence dynamic slices; validity is masked by `kv_len` (static-shape
  discipline — see `ops/attention.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from ..ops.norms import rms_norm, rms_norm_gemma
from ..ops.rope import apply_rope, rope_cos_sin, rope_frequencies
from ..quant.linear import Weight, embedding_lookup, linear
from ..quant.qtensor import QTensor
from .config import ModelConfig

ACTIVATIONS = {
    "silu": jax.nn.silu,
    "gelu": partial(jax.nn.gelu, approximate=False),
    "gelu_new": partial(jax.nn.gelu, approximate=True),
    "gelu_pytorch_tanh": partial(jax.nn.gelu, approximate=True),
    "relu": jax.nn.relu,
}


# ---------------------------------------------------------------------------
# KV cache (simple contiguous per-sequence cache; paged cache lives in kv/)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KVCache:
    """Fixed-capacity KV cache: k/v of [L, B, S, n_kv, head_dim]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def capacity(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(KVCache, data_fields=["k", "v"], meta_fields=[])


def _write_kv(cache_layer: jax.Array, new: jax.Array, starts: jax.Array) -> jax.Array:
    """Insert new [B, T, n_kv, hd] at per-sequence offsets into [B, S, n_kv, hd]."""

    def one(row, new_row, start):
        return jax.lax.dynamic_update_slice(row, new_row, (start, 0, 0))

    return jax.vmap(one)(cache_layer, new, starts)


# ---------------------------------------------------------------------------
# layer + model forward
# ---------------------------------------------------------------------------


def _maybe_norm(x, w, eps, gemma: bool):
    return rms_norm_gemma(x, w, eps) if gemma else rms_norm(x, w, eps)


def _mlp(x, lw: dict, act, backend):
    gate = linear(x, lw["gate"], lw.get("gate_bias"), backend=backend)
    up = linear(x, lw["up"], lw.get("up_bias"), backend=backend)
    return linear(act(gate) * up, lw["down"], lw.get("down_bias"), backend=backend)


def _moe_mlp(x, lw: dict, cfg: ModelConfig, act, backend):
    """Dense-compute MoE (every expert computed, masked combine).

    TPU-friendly for small expert counts (Mixtral 8): no gathers, pure matmul
    — the `gather_forward` sparse path is a later optimization (reference:
    `mistralrs-core/src/moe/experts/mod.rs:36`).
    """
    b, t, _ = x.shape
    router_logits = linear(x, lw["router"], backend=backend).astype(jnp.float32)
    if cfg.arch == "mixtral":
        probs = jax.nn.softmax(router_logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    else:
        topw, topi = jax.lax.top_k(router_logits, cfg.num_experts_per_tok)
        topw = jax.nn.softmax(topw, axis=-1)
        if cfg.norm_topk_prob:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    # scatter top-k weights into a dense [B, T, E] combine matrix
    full_w = (
        jnp.zeros((b, t, cfg.num_experts), jnp.float32)
        .at[jnp.arange(b)[:, None, None], jnp.arange(t)[None, :, None], topi]
        .add(topw)
    )

    def expert(carry, xs):
        acc, idx = carry
        ew = xs
        y = _mlp(x, ew, act, backend)
        acc = acc + y * full_w[..., idx][..., None].astype(y.dtype)
        return (acc, idx + 1), None

    (out, _), _ = jax.lax.scan(
        expert, (jnp.zeros_like(x), jnp.int32(0)), lw["experts"]
    )
    if "shared_expert" in lw:
        out = out + _mlp(x, lw["shared_expert"], act, backend)
    return out


def _layer_step(
    cfg: ModelConfig,
    backend: Optional[str],
    act,
    h: jax.Array,  # [B, T, H]
    lw: dict,  # this layer's weights
    k_cache: jax.Array,  # [B, S, n_kv, hd]
    v_cache: jax.Array,
    cos: jax.Array,  # [B, T, hd//2]
    sin: jax.Array,
    positions: jax.Array,  # [B, T]
    kv_start: jax.Array,  # [B] write offset (= tokens already cached)
    window: jax.Array,  # scalar int32; 0 → full attention
):
    b, t, _ = h.shape
    gemma = cfg.arch.startswith("gemma")
    x = _maybe_norm(h, lw["attn_norm"], cfg.rms_norm_eps, gemma)

    q = linear(x, lw["wq"], lw.get("wq_bias"), backend=backend)
    k = linear(x, lw["wk"], lw.get("wk_bias"), backend=backend)
    v = linear(x, lw["wv"], lw.get("wv_bias"), backend=backend)
    q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)

    if cfg.qk_norm:
        q = rms_norm(q, lw["q_norm"], cfg.rms_norm_eps) if not gemma else rms_norm_gemma(q, lw["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lw["k_norm"], cfg.rms_norm_eps) if not gemma else rms_norm_gemma(k, lw["k_norm"], cfg.rms_norm_eps)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    k_cache = _write_kv(k_cache, k, kv_start)
    v_cache = _write_kv(v_cache, v, kv_start)
    kv_len = kv_start + t

    attn = sdpa(
        q, k_cache, v_cache,
        q_positions=positions,
        kv_len=kv_len,
        logit_softcap=cfg.attn_logit_softcap,
        sliding_window=window,  # 0 → full attention (handled in sdpa)
    )
    attn = attn.reshape(b, t, cfg.num_heads * cfg.head_dim)
    attn_out = linear(attn, lw["wo"], lw.get("wo_bias"), backend=backend)
    if "post_attn_norm" in lw:  # gemma2/3 post-attention scaling norm
        attn_out = _maybe_norm(attn_out, lw["post_attn_norm"], cfg.rms_norm_eps, gemma)
    h = h + attn_out

    x = _maybe_norm(h, lw["ffn_norm"], cfg.rms_norm_eps, gemma)
    if cfg.num_experts > 0 and "experts" in lw:
        mlp_out = _moe_mlp(x, lw, cfg, act, backend)
    else:
        mlp_out = _mlp(x, lw, act, backend)
    if "post_ffn_norm" in lw:
        mlp_out = _maybe_norm(mlp_out, lw["post_ffn_norm"], cfg.rms_norm_eps, gemma)
    h = h + mlp_out
    return h, k_cache, v_cache


def forward(
    weights: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: KVCache,
    kv_start: jax.Array,  # [B] number of tokens already in the cache
    *,
    backend: Optional[str] = None,
    logits_last_only: bool = False,
    compute_dtype=jnp.bfloat16,
) -> tuple[jax.Array, KVCache]:
    """Run the decoder; returns (logits [B, T or 1, V] f32, updated cache)."""
    act = ACTIVATIONS[cfg.hidden_act]
    h = embedding_lookup(input_ids, weights["embed"], dtype=compute_dtype)
    if cfg.arch.startswith("gemma"):
        h = h * jnp.asarray(
            cfg.embedding_multiplier or cfg.hidden_size**0.5, h.dtype
        )

    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)

    windows = weights["layer_windows"]  # [L] int32 (0 = full attention)

    def body(h, xs):
        lw, k_c, v_c, win = xs
        h, k_c, v_c = _layer_step(
            cfg, backend, act, h, lw, k_c, v_c, cos, sin, positions, kv_start, win
        )
        return h, (k_c, v_c)

    h, (new_k, new_v) = jax.lax.scan(
        body, h, (weights["layers"], cache.k, cache.v, windows)
    )

    h = _maybe_norm(
        h, weights["final_norm"], cfg.rms_norm_eps, cfg.arch.startswith("gemma")
    )
    if logits_last_only:
        h = h[:, -1:, :]
    lm_head = weights.get("lm_head")
    if lm_head is None:
        lm_head = weights["embed"]  # tied embeddings
    logits = linear(h, lm_head, backend=backend).astype(jnp.float32)
    if cfg.logit_softcap:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
    return logits, KVCache(new_k, new_v)


# ---------------------------------------------------------------------------
# weight construction helpers
# ---------------------------------------------------------------------------


def layer_windows(cfg: ModelConfig) -> np.ndarray:
    """Per-layer sliding window sizes [L] (0 = full attention)."""
    out = np.zeros(cfg.num_layers, dtype=np.int32)
    if cfg.sliding_window:
        if cfg.layer_types:
            for i, lt in enumerate(cfg.layer_types):
                if lt == "sliding_attention":
                    out[i] = cfg.sliding_window
        elif cfg.arch in ("gemma2", "gemma3"):
            # every other layer (gemma2: even layers sliding)
            for i in range(cfg.num_layers):
                if (i % 2 == 0) if cfg.arch == "gemma2" else ((i + 1) % 6 != 0):
                    out[i] = cfg.sliding_window
        else:  # mistral-style: uniform sliding window
            out[:] = cfg.sliding_window
    return out


def init_random_weights(
    cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16, scale: float = 0.02
) -> dict:
    """Random dense weights (testing; stacked-layer layout)."""
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale, dtype)

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "ffn_norm": jnp.ones((L, H), dtype),
        "wq": arr(L, cfg.q_dim, H),
        "wk": arr(L, cfg.kv_dim, H),
        "wv": arr(L, cfg.kv_dim, H),
        "wo": arr(L, H, cfg.q_dim),
        "gate": arr(L, I, H),
        "up": arr(L, I, H),
        "down": arr(L, H, I),
    }
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    return {
        "embed": arr(cfg.vocab_size, H),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": None if cfg.tie_word_embeddings else arr(cfg.vocab_size, H),
        "layer_windows": jnp.asarray(layer_windows(cfg)),
    }
