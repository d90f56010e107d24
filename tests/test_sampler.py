"""Sampler semantics (analog of the reference's sampler.rs unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.engine.sampler import (
    BatchSamplingState,
    SamplingParams,
    make_batch_state,
    sample,
)

V = 64


def _state(**kw):
    params = SamplingParams(**kw)
    return make_batch_state([params], V, [[]])


def _logits(vals: dict[int, float]) -> jnp.ndarray:
    out = np.full((1, V), -10.0, np.float32)
    for k, v in vals.items():
        out[0, k] = v
    return jnp.asarray(out)


def test_greedy_picks_argmax():
    st = _state(temperature=0.0)
    toks, lp, _tops, _ = sample(_logits({7: 5.0, 9: 4.0}), st, jax.random.PRNGKey(0))
    assert int(toks[0]) == 7
    assert lp[0] <= 0


def test_top_k_restricts_support():
    st = _state(temperature=1.0, top_k=2)
    logits = _logits({3: 5.0, 4: 4.9, 5: 4.8})
    seen = set()
    for i in range(30):
        toks, _, _tops, _ = sample(logits, st, jax.random.PRNGKey(i))
        seen.add(int(toks[0]))
    assert seen <= {3, 4}


def test_top_p_restricts_support():
    st = _state(temperature=1.0, top_p=0.5)
    # token 3 has ~73% prob → top_p=0.5 keeps only token 3
    logits = _logits({3: 5.0, 4: 4.0})
    for i in range(20):
        toks, _, _tops, _ = sample(logits, st, jax.random.PRNGKey(i))
        assert int(toks[0]) == 3


def test_min_p_restricts_support():
    st = _state(temperature=1.0, min_p=0.5)
    logits = _logits({3: 5.0, 4: 4.5, 5: 0.0})  # p4/p3 = e^-0.5 ≈ 0.61 > 0.5
    seen = set()
    for i in range(40):
        toks, _, _tops, _ = sample(logits, st, jax.random.PRNGKey(i))
        seen.add(int(toks[0]))
    assert seen <= {3, 4}
    assert 3 in seen


def test_repetition_penalty_suppresses_seen():
    params = SamplingParams(temperature=0.0, repetition_penalty=100.0)
    st = make_batch_state([params], V, [[7]])  # token 7 already in context
    toks, _, _tops, _ = sample(_logits({7: 5.0, 9: 4.9}), st, jax.random.PRNGKey(0))
    assert int(toks[0]) == 9


def test_frequency_penalty_accumulates():
    st = _state(temperature=0.0, frequency_penalty=0.6)
    logits = _logits({7: 5.0, 9: 4.9})
    toks1, _, _tops, st = sample(logits, st, jax.random.PRNGKey(0))
    assert int(toks1[0]) == 7
    toks2, _, _tops, st = sample(logits, st, jax.random.PRNGKey(1))
    assert int(toks2[0]) == 9  # 7 now penalized below 9


def test_logit_bias():
    params = SamplingParams(temperature=0.0, logit_bias={9: 100.0})
    st = make_batch_state([params], V, [[]])
    toks, _, _tops, _ = sample(_logits({7: 5.0}), st, jax.random.PRNGKey(0))
    assert int(toks[0]) == 9


def test_batched_mixed_params():
    params = [
        SamplingParams(temperature=0.0),
        SamplingParams(temperature=1.0, top_k=1),
    ]
    st = make_batch_state(params, V, [[], []])
    logits = jnp.concatenate([_logits({3: 9.0}), _logits({5: 9.0})])
    toks, _, _tops, _ = sample(logits, st, jax.random.PRNGKey(0))
    assert toks.tolist() == [3, 5]
