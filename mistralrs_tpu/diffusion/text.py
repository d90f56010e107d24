"""FLUX text conditioning: T5 encoder + CLIP text encoder — the analog of
the reference's `diffusion_models/t5/` and `diffusion_models/clip/text.rs`.

Both are logit-parity-tested against the HF `transformers` implementations
(tests/test_flux_text.py). T5 quirks mirrored: no attention scaling
(1.0, not 1/sqrt(d)), relative-position bucket bias shared from layer 0,
pre-RMSNorm without mean subtraction. CLIP: learned positions, causal mask,
quick-gelu, pooled output at the EOS token."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# T5 encoder
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class T5Config:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_layers: int
    num_heads: int
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # v1.1 (flux's t5-xxl)

    @classmethod
    def from_hf(cls, d: Mapping) -> "T5Config":
        return cls(
            vocab_size=d["vocab_size"], d_model=d["d_model"], d_kv=d["d_kv"],
            d_ff=d["d_ff"], num_layers=d["num_layers"],
            num_heads=d["num_heads"],
            relative_attention_num_buckets=d.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=d.get(
                "relative_attention_max_distance", 128),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-6),
            feed_forward_proj=d.get("feed_forward_proj", "relu"),
        )


def _t5_rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def _t5_buckets(rel_pos: jax.Array, num_buckets: int, max_dist: int) -> jax.Array:
    """Bidirectional relative-position bucketing (T5 `_relative_position_bucket`)."""
    nb = num_buckets // 2
    ret = jnp.where(rel_pos > 0, nb, 0)
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / np.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return ret + jnp.where(n < max_exact, n, large)


def t5_encode(params: dict, cfg: T5Config, input_ids: jax.Array) -> jax.Array:
    """[B, T] → encoder hidden states [B, T, d_model]."""
    h = params["embed"][input_ids]
    t = input_ids.shape[1]
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = _t5_buckets(
        rel, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    # [heads, T, T] bias from layer-0's table, shared by every layer
    bias = params["rel_bias"][buckets].transpose(2, 0, 1)[None]

    for lw in params["layers"]:
        x = _t5_rms(h, lw["ln1"], cfg.layer_norm_epsilon)
        b, tt, _ = x.shape
        nh, dkv = cfg.num_heads, cfg.d_kv
        q = (x @ lw["q"].T).reshape(b, tt, nh, dkv).transpose(0, 2, 1, 3)
        k = (x @ lw["k"].T).reshape(b, tt, nh, dkv).transpose(0, 2, 1, 3)
        v = (x @ lw["v"].T).reshape(b, tt, nh, dkv).transpose(0, 2, 1, 3)
        # NOTE: T5 does NOT scale by 1/sqrt(d_kv)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs,
                          v.astype(jnp.float32)).astype(h.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, tt, nh * dkv)
        h = h + attn @ lw["o"].T

        x = _t5_rms(h, lw["ln2"], cfg.layer_norm_epsilon)
        if "wi_1" in lw:  # gated (v1.1): gelu(wi_0 x) * wi_1 x
            ff = jax.nn.gelu(x @ lw["wi_0"].T, approximate=True) * (x @ lw["wi_1"].T)
        else:
            ff = jax.nn.relu(x @ lw["wi"].T)
        h = h + ff @ lw["wo"].T
    return _t5_rms(h, params["final_ln"], cfg.layer_norm_epsilon)


def t5_params_from_state_dict(sd: Mapping[str, np.ndarray], cfg: T5Config,
                              dtype=jnp.float32) -> dict:
    def g(n):
        return jnp.asarray(np.asarray(sd[n], np.float32), dtype)

    pre = "encoder."
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}block.{i}.layer."
        lw = {
            "ln1": g(p + "0.layer_norm.weight"),
            "q": g(p + "0.SelfAttention.q.weight"),
            "k": g(p + "0.SelfAttention.k.weight"),
            "v": g(p + "0.SelfAttention.v.weight"),
            "o": g(p + "0.SelfAttention.o.weight"),
            "ln2": g(p + "1.layer_norm.weight"),
            "wo": g(p + "1.DenseReluDense.wo.weight"),
        }
        if p + "1.DenseReluDense.wi_0.weight" in sd:
            lw["wi_0"] = g(p + "1.DenseReluDense.wi_0.weight")
            lw["wi_1"] = g(p + "1.DenseReluDense.wi_1.weight")
        else:
            lw["wi"] = g(p + "1.DenseReluDense.wi.weight")
        layers.append(lw)
    embed_key = "shared.weight" if "shared.weight" in sd else pre + "embed_tokens.weight"
    return {
        "embed": g(embed_key),
        "rel_bias": g(
            pre + "block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ),
        "layers": layers,
        "final_ln": g(pre + "final_layer_norm.weight"),
    }


# --------------------------------------------------------------------------
# CLIP text encoder
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 2

    @classmethod
    def from_hf(cls, d: Mapping) -> "ClipTextConfig":
        return cls(
            vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            max_position_embeddings=d.get("max_position_embeddings", 77),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            eos_token_id=d.get("eos_token_id", 2),
        )


def _ln(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def clip_text_encode(
    params: dict, cfg: ClipTextConfig, input_ids: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """[B, T] → (last hidden [B, T, H], pooled [B, H] at the EOS token)."""
    b, t = input_ids.shape
    h = params["embed"][input_ids] + params["pos_embed"][:t]
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    scale = hd ** -0.5
    for lw in params["layers"]:
        x = _ln(h, lw["ln1_w"], lw["ln1_b"], cfg.layer_norm_eps)
        q = (x @ lw["q"].T + lw["q_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = (x @ lw["k"].T + lw["k_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = (x @ lw["v"].T + lw["v_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale + causal
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs,
                          v.astype(jnp.float32)).astype(h.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        h = h + attn @ lw["o"].T + lw["o_b"]
        x = _ln(h, lw["ln2_w"], lw["ln2_b"], cfg.layer_norm_eps)
        # CLIP quick_gelu: x * sigmoid(1.702 x)
        ff = x @ lw["fc1"].T + lw["fc1_b"]
        ff = ff * jax.nn.sigmoid(1.702 * ff)
        h = h + ff @ lw["fc2"].T + lw["fc2_b"]
    h = _ln(h, params["final_ln_w"], params["final_ln_b"], cfg.layer_norm_eps)
    if cfg.eos_token_id == 2:
        # legacy CLIP convention (the released openai checkpoints): pool at
        # the highest token id (EOT is the largest vocab entry)
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
        )
    pooled = h[jnp.arange(b), eos_pos]
    return h, pooled


def clip_text_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: ClipTextConfig, dtype=jnp.float32
) -> dict:
    def g(n):
        return jnp.asarray(np.asarray(sd[n], np.float32), dtype)

    pre = "text_model."
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}encoder.layers.{i}."
        layers.append({
            "ln1_w": g(p + "layer_norm1.weight"),
            "ln1_b": g(p + "layer_norm1.bias"),
            "q": g(p + "self_attn.q_proj.weight"),
            "q_b": g(p + "self_attn.q_proj.bias"),
            "k": g(p + "self_attn.k_proj.weight"),
            "k_b": g(p + "self_attn.k_proj.bias"),
            "v": g(p + "self_attn.v_proj.weight"),
            "v_b": g(p + "self_attn.v_proj.bias"),
            "o": g(p + "self_attn.out_proj.weight"),
            "o_b": g(p + "self_attn.out_proj.bias"),
            "ln2_w": g(p + "layer_norm2.weight"),
            "ln2_b": g(p + "layer_norm2.bias"),
            "fc1": g(p + "mlp.fc1.weight"),
            "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2": g(p + "mlp.fc2.weight"),
            "fc2_b": g(p + "mlp.fc2.bias"),
        })
    return {
        "embed": g(pre + "embeddings.token_embedding.weight"),
        "pos_embed": g(pre + "embeddings.position_embedding.weight"),
        "layers": layers,
        "final_ln_w": g(pre + "final_layer_norm.weight"),
        "final_ln_b": g(pre + "final_layer_norm.bias"),
    }
