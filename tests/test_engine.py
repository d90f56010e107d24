"""Engine + scheduler + paged KV integration: continuous batching must agree
with the simple contiguous-cache generate() path (greedy), survive
preemption, and hit the prefix cache (analog of the reference's scheduler /
block-pool test matrix, SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.engine.sequence import StopReason
from mistralrs_tpu.generate import generate
from mistralrs_tpu.models import ModelConfig, init_random_weights

CFG = ModelConfig(
    arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=512,
)
WEIGHTS = init_random_weights(CFG, seed=7)


def _engine(**kw):
    kw.setdefault("num_blocks", 64)
    kw.setdefault("block_size", 16)
    kw.setdefault("max_batch", 4)
    kw.setdefault("backend", "xla")
    kw.setdefault("compute_dtype", jnp.float32)
    return Engine(CFG, WEIGHTS, **kw)


def _ref_tokens(prompt, n):
    return generate(
        WEIGHTS, CFG, prompt, max_new_tokens=n, temperature=0.0,
        stop_tokens=set(), compute_dtype=jnp.float32,
    )


def test_single_request_matches_generate():
    eng = _engine()
    prompt = [1, 5, 9, 200, 7]
    seq = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=8))
    finished = eng.run_to_completion()
    assert len(finished) == 1
    ref = _ref_tokens(prompt, 8)
    assert seq.output_ids == ref


def test_batch_requests_match_generate():
    eng = _engine()
    prompts = [[1, 5, 9], [2, 4, 6, 8, 10, 12], [100, 101], [50] * 20]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
        for p in prompts
    ]
    eng.run_to_completion()
    for p, s in zip(prompts, seqs):
        assert s.output_ids == _ref_tokens(p, 6), p


def test_chunked_prefill_long_prompt():
    eng = _engine(prefill_chunk=16, num_blocks=128)
    prompt = list(np.random.default_rng(0).integers(0, 256, 50))
    prompt = [int(x) for x in prompt]
    seq = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=4))
    eng.run_to_completion()
    assert seq.output_ids == _ref_tokens(prompt, 4)


def test_prefix_cache_hit_and_consistency():
    eng = _engine(num_blocks=128)
    prompt = [int(x) for x in np.random.default_rng(1).integers(0, 256, 40)]
    s1 = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=4))
    eng.run_to_completion()
    hits_before = eng.stats["prefix_cache_hit_tokens"]
    s2 = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=4))
    eng.run_to_completion()
    assert eng.stats["prefix_cache_hit_tokens"] > hits_before
    assert s2.output_ids == s1.output_ids


def test_preemption_under_block_pressure():
    # tiny pool: force preemption while 3 long generations run
    eng = _engine(num_blocks=9, block_size=16, max_batch=4)
    seqs = [
        eng.add_request(
            [int(x) for x in np.random.default_rng(i).integers(0, 256, 20)],
            SamplingParams(temperature=0.0, max_tokens=40),
        )
        for i in range(3)
    ]
    finished = eng.run_to_completion()
    assert len(finished) == 3
    for s in seqs:
        assert s.stop_reason in (StopReason.LENGTH, StopReason.EOS)
        # preempted-and-recomputed sequences still produce full output
        assert len(s.generated_ids) == 40 or s.stop_reason == StopReason.EOS
    assert eng.stats["preemptions"] > 0
    # preempted sequences must match the un-preempted reference
    for i, s in enumerate(seqs):
        prompt = [int(x) for x in np.random.default_rng(i).integers(0, 256, 20)]
        assert s.generated_ids == _ref_tokens(prompt, 40), i


def test_max_tokens_and_stop_tokens():
    eng = _engine()
    s1 = eng.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=3))
    ref = _ref_tokens([1, 2, 3], 4)
    s2 = eng.add_request(
        [1, 2, 3],
        SamplingParams(temperature=0.0, max_tokens=10, stop_token_ids=(ref[1],)),
    )
    eng.run_to_completion()
    assert len(s1.output_ids) == 3 and s1.stop_reason == StopReason.LENGTH
    assert s2.output_ids[-1] == ref[1] and s2.stop_reason == StopReason.STOP_TOKEN


def test_streaming_callback():
    eng = _engine()
    got = []
    eng.add_request(
        [9, 8, 7],
        SamplingParams(temperature=0.0, max_tokens=5),
        on_tokens=lambda toks, fin: got.append((list(toks), fin)),
    )
    eng.run_to_completion()
    assert len(got) == 5
    assert got[-1][1] is True
    assert [t for ts, _ in got for t in ts] == _ref_tokens([9, 8, 7], 5)


def test_kv_quant_int8_decoding_close():
    """INT8 KV cache: outputs stay close to the bf16-cache reference
    (PagedCacheType analog)."""
    eng = _engine(kv_quant="int8")
    prompt = [1, 5, 9, 200, 7]
    seq = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=8))
    eng.run_to_completion()
    ref = _ref_tokens(prompt, 8)
    agree = sum(a == b for a, b in zip(seq.output_ids, ref))
    assert agree >= 6, (seq.output_ids, ref)  # small quantization divergence ok


def test_fused_projections_match():
    """fuse_projections (merged QKV / gate+up) is numerically identical."""
    from mistralrs_tpu.models.llama import KVCache, forward, fuse_projections

    fused = fuse_projections(WEIGHTS, CFG)
    assert "wqkv" in fused["layers"] and "wgateup" in fused["layers"]
    ids = np.array([[1, 5, 9, 20]], np.int32)
    pos = jnp.arange(4)[None].astype(jnp.int32)

    def run(w):
        cache = KVCache.create(CFG, 1, 8, dtype=jnp.float32)
        lg, _ = forward(w, CFG, jnp.asarray(ids), pos, cache,
                        jnp.zeros((1,), jnp.int32), backend="xla",
                        compute_dtype=jnp.float32)
        return np.asarray(lg)

    np.testing.assert_allclose(run(fused), run(WEIGHTS), rtol=1e-5, atol=1e-5)


def test_engine_with_fused_projections():
    from mistralrs_tpu.models.llama import fuse_projections

    fused = fuse_projections(WEIGHTS, CFG)
    eng = Engine(CFG, fused, num_blocks=64, block_size=16, max_batch=4,
                 backend="xla", compute_dtype=jnp.float32)
    prompt = [1, 5, 9, 200, 7]
    seq = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=6))
    eng.run_to_completion()
    assert seq.output_ids == _ref_tokens(prompt, 6)
