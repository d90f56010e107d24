"""Rotating (ring) KV cache: window-bounded memory, exact equivalence with
the full cache for sliding-window models (the analog of the reference's
RotatingCache tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.generate import generate
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.models.llama import KVCache, RotatingKVCache, forward

CFG = ModelConfig(
    arch="mistral", vocab_size=96, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=256, sliding_window=8,
)
WEIGHTS = init_random_weights(CFG, seed=33, dtype=jnp.float32)


def test_rotating_matches_full_cache_prefill():
    """Prompt longer than the window: logits identical to the full cache."""
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 20)).astype(np.int32)
    positions = jnp.broadcast_to(jnp.arange(20)[None], (2, 20)).astype(jnp.int32)
    full, _ = forward(
        WEIGHTS, CFG, jnp.asarray(ids), positions,
        KVCache.create(CFG, 2, 24, dtype=jnp.float32),
        jnp.zeros((2,), jnp.int32), compute_dtype=jnp.float32,
    )
    rot_cache = RotatingKVCache.create(CFG, 2, dtype=jnp.float32)
    assert rot_cache.k.shape[2] == CFG.sliding_window  # window-bounded
    rot, _ = forward(
        WEIGHTS, CFG, jnp.asarray(ids), positions, rot_cache,
        jnp.zeros((2,), jnp.int32), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_rotating_generate_matches_full():
    """Greedy decode far past the window matches the full-cache decode."""
    prompt = [3, 17, 40, 9, 22]
    full = generate(WEIGHTS, CFG, prompt, max_new_tokens=24,
                    compute_dtype=jnp.float32, stop_tokens=set())
    rot = generate(WEIGHTS, CFG, prompt, max_new_tokens=24,
                   compute_dtype=jnp.float32, stop_tokens=set(),
                   cache_type="rotating")
    assert rot == full
    assert len(rot) == 24  # well past window=8


def test_rotating_rejects_hybrid():
    cfg = ModelConfig(
        arch="gemma2", vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        max_position_embeddings=64, sliding_window=4,
    )
    with pytest.raises(ValueError):
        RotatingKVCache.create(cfg, 1)


HYB_CFG = ModelConfig(
    arch="gemma2", vocab_size=96, hidden_size=64, intermediate_size=128,
    num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=256, sliding_window=8,
)
HYB_WEIGHTS = init_random_weights(HYB_CFG, seed=41, dtype=jnp.float32)


def test_hybrid_cache_matches_full_prefill():
    """Per-layer window MIX (gemma2 alternating sliding/full): the hybrid
    cache (full pools + ring pools, kv_cache/hybrid_cache.rs analog) gives
    logits identical to the all-full cache, with the ring layers
    window-bounded in memory."""
    from mistralrs_tpu.models.llama import HybridKVCache, layer_windows

    wins = layer_windows(HYB_CFG)
    assert set(int(x) for x in wins) == {0, 8}  # a genuine mix
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, size=(2, 20)).astype(np.int32)
    positions = jnp.broadcast_to(jnp.arange(20)[None], (2, 20)).astype(jnp.int32)
    full, _ = forward(
        HYB_WEIGHTS, HYB_CFG, jnp.asarray(ids), positions,
        KVCache.create(HYB_CFG, 2, 24, dtype=jnp.float32),
        jnp.zeros((2,), jnp.int32), compute_dtype=jnp.float32,
    )
    hyb_cache = HybridKVCache.create(HYB_CFG, 2, 24, dtype=jnp.float32)
    n_win = sum(1 for x in wins if int(x))
    assert hyb_cache.k_win.shape[0] == n_win
    assert hyb_cache.k_win.shape[2] == 8  # window-bounded ring
    assert hyb_cache.k_full.shape[0] == HYB_CFG.num_layers - n_win
    hyb, _ = forward(
        HYB_WEIGHTS, HYB_CFG, jnp.asarray(ids), positions, hyb_cache,
        jnp.zeros((2,), jnp.int32), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(hyb), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_hybrid_generate_matches_full():
    """Greedy decode far past the window through generate(cache_type=
    'hybrid') matches the full-cache decode exactly."""
    prompt = [3, 17, 40, 9, 22]
    full = generate(HYB_WEIGHTS, HYB_CFG, prompt, max_new_tokens=24,
                    compute_dtype=jnp.float32, stop_tokens=set())
    hyb = generate(HYB_WEIGHTS, HYB_CFG, prompt, max_new_tokens=24,
                   compute_dtype=jnp.float32, stop_tokens=set(),
                   cache_type="hybrid")
    assert hyb == full
    assert len(hyb) == 24
