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


def test_speculative_rejects_unsupported_requests():
    eng = Engine(
        TARGET_CFG, TARGET_W, num_blocks=64, block_size=8, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
        draft=(DRAFT_CFG, DRAFT_W), gamma=3,
    )
    # sampled requests are fine now (acceptance sampling) …
    eng.add_request([1, 2, 3], SamplingParams(temperature=0.8, max_tokens=1))
    eng.run_to_completion()
    # … penalties/constraints are not
    with pytest.raises(ValueError):
        eng.add_request(
            [1, 2, 3], SamplingParams(temperature=0.8, repetition_penalty=1.3)
        )
    with pytest.raises(ValueError):
        eng.add_request([1, 2, 3], SamplingParams(constraint="json_object"))


def test_acceptance_identical_models_accepts_everything():
    """draft ≡ target ⇒ p/q = 1 ⇒ every proposal accepted, even sampled."""
    eng = Engine(
        TARGET_CFG, TARGET_W, num_blocks=64, block_size=8, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
        draft=(TARGET_CFG, TARGET_W), gamma=3,
    )
    seq = eng.add_request(
        [1, 5, 9], SamplingParams(temperature=0.9, top_k=20, max_tokens=12)
    )
    eng.run_to_completion()
    assert len(seq.output_ids) >= 12 or seq.stop_reason is not None
    assert eng.stats["spec_accepted"] == eng.stats["spec_drafted"]


def test_acceptance_matches_target_distribution():
    """Spec sampling is lossless: over many runs the committed-token
    distribution matches direct engine sampling (same tiny model, tiny
    vocab, temperature 1)."""
    from collections import Counter

    def first_tokens(draft, n_runs=60):
        c = Counter()
        for seed in range(n_runs):
            eng = Engine(
                TARGET_CFG, TARGET_W, num_blocks=64, block_size=8,
                max_batch=2, backend="xla", compute_dtype=jnp.float32,
                seed=seed, **({"draft": draft, "gamma": 2} if draft else {}),
            )
            seq = eng.add_request(
                [1, 2], SamplingParams(temperature=1.0, max_tokens=3)
            )
            eng.run_to_completion()
            # output_ids[0] comes from prefill sampling (shared path);
            # output_ids[1] is the first SPEC-committed token
            c[seq.output_ids[1]] += 1
        return c

    spec = first_tokens((DRAFT_CFG, DRAFT_W))
    direct = first_tokens(None)
    # both should cover overlapping support; total-variation distance
    # bounded (loose statistical check on 60 samples)
    keys = set(spec) | set(direct)
    tv = sum(abs(spec[k] - direct[k]) for k in keys) / (2 * 60)
    assert tv < 0.35, (tv, spec, direct)
