"""Engine-integrated speculative decoding: greedy-exact losslessness — the
spec engine must emit EXACTLY the tokens the plain engine emits (the analog
of the reference's speculative driver tests, `speculative/driver.rs`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models import ModelConfig, init_random_weights

TARGET_CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=256,
)
DRAFT_CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=32, intermediate_size=64,
    num_layers=1, num_heads=2, num_kv_heads=2, head_dim=16,
    max_position_embeddings=256,
)
TARGET_W = init_random_weights(TARGET_CFG, seed=60, dtype=jnp.float32)
DRAFT_W = init_random_weights(DRAFT_CFG, seed=61, dtype=jnp.float32)


def _run(draft, prompts, max_tokens=24):
    eng = Engine(
        TARGET_CFG, TARGET_W, num_blocks=96, block_size=8, max_batch=4,
        backend="xla", compute_dtype=jnp.float32, draft=draft, gamma=3,
    )
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=max_tokens))
        for p in prompts
    ]
    eng.run_to_completion()
    return [s.generated_ids for s in seqs], eng


def test_speculative_matches_plain_greedy():
    prompts = [[3, 17, 40, 9], [5, 1, 2, 8, 44, 12], [7, 7, 7]]
    plain, _ = _run(None, prompts)
    spec, eng = _run((DRAFT_CFG, DRAFT_W), prompts)
    assert spec == plain
    # the draft is random-vs-random so acceptance can be low, but the
    # counters must be populated and consistent
    assert eng.stats["spec_drafted"] > 0
    assert 0 <= eng.stats["spec_accepted"] <= eng.stats["spec_drafted"]


def test_speculative_self_draft_accepts_everything():
    """Target drafting for itself accepts every drafted token."""
    prompts = [[3, 17, 40, 9]]
    spec, eng = _run((TARGET_CFG, TARGET_W), prompts, max_tokens=16)
    plain, _ = _run(None, prompts, max_tokens=16)
    assert spec == plain
    assert eng.stats["spec_accepted"] == eng.stats["spec_drafted"]


def test_speculative_rejects_sampled_requests():
    eng = Engine(
        TARGET_CFG, TARGET_W, num_blocks=64, block_size=8, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
        draft=(DRAFT_CFG, DRAFT_W), gamma=3,
    )
    with pytest.raises(ValueError):
        eng.add_request([1, 2, 3], SamplingParams(temperature=0.8))
