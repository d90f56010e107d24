"""Tensor-parallel correctness on the virtual 8-device CPU mesh — exercises
real XLA collectives (unlike the reference, which only unit-tests TP-size
logic with DummyComm; SURVEY.md §4 'Distributed testing without a cluster')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward
from mistralrs_tpu.parallel import (
    build_mesh,
    resolve_tp,
    shard_weights,
    tp_forward_fn,
)


def _tiny_state_dict(cfg: ModelConfig, seed=0):
    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def r(*s):
        return (rng.standard_normal(s, dtype=np.float32) * 0.05)

    sd = {
        "model.embed_tokens.weight": r(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(V, H),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(cfg.q_dim, H)
        sd[p + "self_attn.k_proj.weight"] = r(cfg.kv_dim, H)
        sd[p + "self_attn.v_proj.weight"] = r(cfg.kv_dim, H)
        sd[p + "self_attn.o_proj.weight"] = r(H, cfg.q_dim)
        sd[p + "mlp.gate_proj.weight"] = r(I, H)
        sd[p + "mlp.up_proj.weight"] = r(I, H)
        sd[p + "mlp.down_proj.weight"] = r(H, I)
    return sd


CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
)


def _reference_logits(weights, ids):
    b, t = ids.shape
    cache = KVCache.create(CFG, b, t + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    logits, _ = forward(
        weights, CFG, jnp.asarray(ids), positions, cache,
        jnp.zeros((b,), jnp.int32), backend="xla",
        compute_dtype=jnp.float32, logits_last_only=True,
    )
    return np.asarray(logits)


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4), (2, 2)])
def test_tp_matches_single_device(dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip("needs 8 virtual devices")
    sd = _tiny_state_dict(CFG)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    b, t = 2, 6
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (b, t)).astype(np.int32)
    ref = _reference_logits(weights, ids)

    mesh = build_mesh(tp=tp, dp=dp)
    sharded = shard_weights(mesh, weights)
    step = tp_forward_fn(mesh, CFG, weights, backend="xla", compute_dtype=jnp.float32)
    cache = KVCache.create(CFG, b, t + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    logits, new_cache = step(
        sharded, jnp.asarray(ids), positions, cache, jnp.zeros((b,), jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-4)


def test_tp_quantized_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    sd = _tiny_state_dict(CFG, seed=2)
    # quantize with per-shard chunked packing for row-parallel tensors
    tp = 2

    from mistralrs_tpu.models.hf_loader import default_isq_plan

    weights = weights_from_state_dict(
        sd, CFG, dtype=jnp.float32, isq=GGMLType.Q8_0, row_parallel_chunks=tp
    )
    b, t = 2, 5
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, (b, t)).astype(np.int32)
    ref = _reference_logits(weights, ids)

    mesh = build_mesh(tp=tp, dp=2)
    sharded = shard_weights(mesh, weights)
    step = tp_forward_fn(mesh, CFG, weights, backend="xla", compute_dtype=jnp.float32)
    cache = KVCache.create(CFG, b, t + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    logits, _ = step(
        sharded, jnp.asarray(ids), positions, cache, jnp.zeros((b,), jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-4)


def test_resolve_tp_step_down():
    assert resolve_tp(8, 14, 2, 32000) == 2
    assert resolve_tp(8, 32, 8, 32000) == 8
    assert resolve_tp(3, 32, 8, 32000) == 2
    assert resolve_tp(1, 7, 7, 100) == 1


MOE_CFG = ModelConfig(
    arch="mixtral", vocab_size=256, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=192,
)


def _moe_state_dict(cfg: ModelConfig, seed=3):
    rng = np.random.default_rng(seed)
    H, V, Im = cfg.hidden_size, cfg.vocab_size, cfg.moe_intermediate_size

    def r(*s):
        return rng.standard_normal(s, dtype=np.float32) * 0.05

    sd = {
        "model.embed_tokens.weight": r(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(V, H),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(cfg.q_dim, H)
        sd[p + "self_attn.k_proj.weight"] = r(cfg.kv_dim, H)
        sd[p + "self_attn.v_proj.weight"] = r(cfg.kv_dim, H)
        sd[p + "self_attn.o_proj.weight"] = r(H, cfg.q_dim)
        sd[p + "block_sparse_moe.gate.weight"] = r(cfg.num_experts, H)
        for e in range(cfg.num_experts):
            ep = p + f"block_sparse_moe.experts.{e}."
            sd[ep + "w1.weight"] = r(Im, H)
            sd[ep + "w3.weight"] = r(Im, H)
            sd[ep + "w2.weight"] = r(H, Im)
    return sd


@pytest.mark.parametrize("tp,mode", [(4, "ep"), (2, "ep"), (4, "tp")])
def test_moe_expert_parallel_matches_single_device(tp, mode, monkeypatch):
    """Expert-parallel sharding (whole experts per shard, one psum) is
    exact vs single-device — the capability the reference lacks (it only
    TP-shards within experts, moe/experts/mod.rs:36)."""
    if len(jax.devices()) < tp:
        pytest.skip("needs virtual devices")
    monkeypatch.setenv("MRSTPU_MOE_SHARD", mode)
    from mistralrs_tpu.parallel.tp import expert_parallel, weight_pspecs

    sd = _moe_state_dict(MOE_CFG)
    weights = weights_from_state_dict(sd, MOE_CFG, dtype=jnp.float32)
    b, t = 2, 6
    rng = np.random.default_rng(4)
    ids = rng.integers(0, MOE_CFG.vocab_size, (b, t)).astype(np.int32)
    b_, t_ = ids.shape
    cache0 = KVCache.create(MOE_CFG, b_, t_ + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t_)[None], (b_, t_)).astype(jnp.int32)
    ref, _ = forward(
        weights, MOE_CFG, jnp.asarray(ids), positions, cache0,
        jnp.zeros((b_,), jnp.int32), backend="xla",
        compute_dtype=jnp.float32, logits_last_only=True,
    )

    mesh = build_mesh(tp=tp, dp=1)
    ep = expert_parallel(MOE_CFG, tp)
    assert ep == (mode == "ep")
    sharded = shard_weights(
        mesh, weights, specs=weight_pspecs(weights, ep=ep)
    )
    step = tp_forward_fn(
        mesh, MOE_CFG, weights, backend="xla", compute_dtype=jnp.float32
    )
    cache = KVCache.create(MOE_CFG, b_, t_ + 4, dtype=jnp.float32)
    logits, _ = step(
        sharded, jnp.asarray(ids), positions, cache, jnp.zeros((b_,), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
