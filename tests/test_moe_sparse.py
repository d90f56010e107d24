"""Sparse (gather-dispatch) MoE combine: exact equivalence with the dense
every-expert path for large expert counts."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.llama import _moe_mlp, ACTIVATIONS


def _setup(E=32, k=4, b=2, t=3, h=16, i=24, seed=0):
    rng = np.random.default_rng(seed)
    cfg = ModelConfig(
        arch="qwen3moe", vocab_size=32, hidden_size=h, intermediate_size=i,
        num_layers=1, num_heads=2, num_kv_heads=2, head_dim=8,
        num_experts=E, num_experts_per_tok=k, norm_topk_prob=True,
        max_position_embeddings=64,
    )
    lw = {
        "router": jnp.asarray(rng.standard_normal((E, h)), jnp.float32),
        "experts": {
            "gate": jnp.asarray(rng.standard_normal((E, i, h)) * 0.1, jnp.float32),
            "up": jnp.asarray(rng.standard_normal((E, i, h)) * 0.1, jnp.float32),
            "down": jnp.asarray(rng.standard_normal((E, h, i)) * 0.1, jnp.float32),
        },
    }
    x = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    return cfg, lw, x


def test_sparse_matches_dense():
    cfg, lw, x = _setup()
    act = ACTIVATIONS["silu"]
    os.environ["MRSTPU_MOE_SPARSE_MIN_E"] = "16"
    try:
        sparse = np.asarray(_moe_mlp(x, lw, cfg, act, None))
        os.environ["MRSTPU_MOE_SPARSE_MIN_E"] = "10000"  # force dense
        dense = np.asarray(_moe_mlp(x, lw, cfg, act, None))
    finally:
        os.environ.pop("MRSTPU_MOE_SPARSE_MIN_E", None)
    np.testing.assert_allclose(sparse, dense, rtol=2e-5, atol=2e-5)


def test_sparse_skewed_routing_exact():
    """All tokens routed to one expert (capacity worst case) stays exact."""
    cfg, lw, x = _setup(seed=3)
    # bias the router so one expert dominates
    lw = dict(lw)
    router = np.array(lw["router"])
    router[7] += 50.0
    lw["router"] = jnp.asarray(router)
    act = ACTIVATIONS["silu"]
    os.environ["MRSTPU_MOE_SPARSE_MIN_E"] = "16"
    try:
        sparse = np.asarray(_moe_mlp(x, lw, cfg, act, None))
        os.environ["MRSTPU_MOE_SPARSE_MIN_E"] = "10000"
        dense = np.asarray(_moe_mlp(x, lw, cfg, act, None))
    finally:
        os.environ.pop("MRSTPU_MOE_SPARSE_MIN_E", None)
    np.testing.assert_allclose(sparse, dense, rtol=2e-5, atol=2e-5)
