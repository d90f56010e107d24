"""Speculative decoding: greedy equivalence with target-only decoding and
acceptance accounting (analog of the reference's speculative driver tests)."""

import numpy as np

import jax.numpy as jnp

from mistralrs_tpu.generate import generate
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.speculative import speculative_generate

TARGET_CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=256,
)
DRAFT_CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=32, intermediate_size=64,
    num_layers=1, num_heads=2, num_kv_heads=1, head_dim=16,
    max_position_embeddings=256,
)
TARGET_W = init_random_weights(TARGET_CFG, seed=11)
DRAFT_W = init_random_weights(DRAFT_CFG, seed=12)


def test_greedy_speculative_equals_target_only():
    prompt = [1, 9, 33, 7]
    ref = generate(
        TARGET_W, TARGET_CFG, prompt, max_new_tokens=16, temperature=0.0,
        stop_tokens=set(), compute_dtype=jnp.float32,
    )
    got, stats = speculative_generate(
        TARGET_W, TARGET_CFG, DRAFT_W, DRAFT_CFG, prompt,
        max_new_tokens=16, gamma=3, temperature=0.0,
        compute_dtype=jnp.float32, stop_tokens=set(), collect_stats=True,
    )
    assert got == ref
    assert stats["drafted"] > 0


def test_self_draft_accepts_everything():
    """Draft == target ⇒ greedy acceptance rate 100%."""
    prompt = [2, 4, 6]
    got, stats = speculative_generate(
        TARGET_W, TARGET_CFG, TARGET_W, TARGET_CFG, prompt,
        max_new_tokens=12, gamma=4, temperature=0.0,
        compute_dtype=jnp.float32, stop_tokens=set(), collect_stats=True,
    )
    assert stats["acceptance_rate"] == 1.0
    ref = generate(
        TARGET_W, TARGET_CFG, prompt, max_new_tokens=12, temperature=0.0,
        stop_tokens=set(), compute_dtype=jnp.float32,
    )
    assert got == ref


def test_sampled_speculative_runs():
    got = speculative_generate(
        TARGET_W, TARGET_CFG, DRAFT_W, DRAFT_CFG, [5, 10, 15],
        max_new_tokens=10, gamma=3, temperature=0.8, seed=3,
        compute_dtype=jnp.float32, stop_tokens=set(),
    )
    assert 0 < len(got) <= 10
    assert all(0 <= t < 128 for t in got)
