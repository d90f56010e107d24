"""Batched on-device sampler — the analog of the reference's `Sampler`
(`mistralrs-core/src/sampler.rs:282`: temperature, top-k/top-p/min-p,
frequency/presence/repetition penalties, logit bias, on-device top-k paths
`sampler.rs:964-1086`).

TPU design: the whole batch samples in ONE jitted call with per-sequence
parameter vectors — no per-sequence host loop. Top-k/top-p/min-p share a
single descending sort (the analog of the CUDA `topk_logits` kernel); token
history lives as a dense [B, V] count matrix so penalties are pure vector ops.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
TOP_LOGPROBS = 8  # top-k logprobs returned per step (OpenAI top_logprobs)


@dataclass
class SamplingParams:
    """Per-request sampling configuration (host-side)."""

    temperature: float = 1.0
    top_k: int = 0  # 0 → disabled
    top_p: float = 1.0
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    logit_bias: dict[int, float] = field(default_factory=dict)
    # grammar constraint: None | "json_object" | "json" | a recognizer object
    # (grammar.py JsonConstraint/ChoiceConstraint)
    constraint: object = None
    max_tokens: int = 512
    stop_token_ids: tuple[int, ...] = ()
    stop_strings: tuple[str, ...] = ()
    n_logprobs: int = 0
    # DRY repetition penalty (reference: `mistralrs-core/src/dry.rs` /
    # sampler DrySamplingParams): penalize tokens that would extend a
    # sequence already seen in the context
    dry_multiplier: float = 0.0  # 0 → disabled
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_sequence_breaker_ids: tuple[int, ...] = ()

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0


_DRY_MAX_NGRAM = 50


def dry_penalty_row(
    ctx, params: "SamplingParams", vocab_size: int
) -> Optional[np.ndarray]:
    """Negative logit adjustments [V] for the DRY repetition penalty, or None
    when nothing matches. ``ctx`` is the full token context (prompt + output).

    For every earlier occurrence of the current last token, the token that
    followed it is penalized by ``multiplier * base^(match_len -
    allowed_length)`` where ``match_len`` is the length of the repeated
    suffix (reference semantics: `mistralrs-core/src/dry.rs`)."""
    n = len(ctx)
    if params.dry_multiplier <= 0.0 or n < 2:
        return None
    breakers = set(params.dry_sequence_breaker_ids)
    last = ctx[-1]
    if last in breakers:
        return None
    pen: dict[int, float] = {}
    for i in range(n - 1):
        if ctx[i] != last:
            continue
        length = 1
        while (
            length < _DRY_MAX_NGRAM
            and length <= i
            and n - 1 - length >= 0
            and ctx[i - length] == ctx[n - 1 - length]
            and ctx[i - length] not in breakers
        ):
            length += 1
        cand = ctx[i + 1]
        if cand in breakers or not 0 <= cand < vocab_size:
            continue
        if length >= params.dry_allowed_length:
            v = params.dry_multiplier * (
                params.dry_base ** (length - params.dry_allowed_length)
            )
            if v > pen.get(cand, 0.0):
                pen[cand] = v
    if not pen:
        return None
    row = np.zeros((vocab_size,), np.float32)
    for t, v in pen.items():
        row[t] = -v
    return row


@dataclass(frozen=True)
class BatchSamplingState:
    """Device-side per-batch-slot sampling state (a pytree)."""

    temperature: jax.Array  # [B] f32 (0 → greedy)
    top_k: jax.Array  # [B] i32 (0 → off)
    top_p: jax.Array  # [B] f32
    min_p: jax.Array  # [B] f32
    frequency_penalty: jax.Array  # [B] f32
    presence_penalty: jax.Array  # [B] f32
    repetition_penalty: jax.Array  # [B] f32
    counts: jax.Array  # [B, V] i32 token occurrence counts (context + generated)
    logit_bias: jax.Array  # [B, V] f32
    constraint_bias: jax.Array  # [B, V] f32 (0 or −inf; grammar masks)


jax.tree_util.register_dataclass(
    BatchSamplingState,
    data_fields=[
        "temperature", "top_k", "top_p", "min_p", "frequency_penalty",
        "presence_penalty", "repetition_penalty", "counts", "logit_bias",
        "constraint_bias",
    ],
    meta_fields=[],
)


def make_batch_state(
    params: list[SamplingParams], vocab_size: int, prompt_ids: list[list[int]]
) -> BatchSamplingState:
    b = len(params)
    counts = np.zeros((b, vocab_size), np.int32)
    bias = np.zeros((b, vocab_size), np.float32)
    for i, (p, toks) in enumerate(zip(params, prompt_ids)):
        ids, c = np.unique(np.asarray(toks, np.int64), return_counts=True)
        if ids.size:
            counts[i, ids] = c
        for tok, v in p.logit_bias.items():
            if 0 <= tok < vocab_size:
                bias[i, tok] = v
    f = lambda attr: jnp.asarray([getattr(p, attr) for p in params], jnp.float32)
    return BatchSamplingState(
        temperature=f("temperature"),
        top_k=jnp.asarray([p.top_k for p in params], jnp.int32),
        top_p=f("top_p"),
        min_p=f("min_p"),
        frequency_penalty=f("frequency_penalty"),
        presence_penalty=f("presence_penalty"),
        repetition_penalty=f("repetition_penalty"),
        counts=jnp.asarray(counts),
        logit_bias=jnp.asarray(bias),
        constraint_bias=jnp.zeros((b, vocab_size), jnp.float32),
    )


def _sample_core(
    logits: jax.Array,  # [B, V] f32
    state: BatchSamplingState,
    key: jax.Array,
    update=None,  # [B] i32 0/1 rows whose counts absorb the sampled token
):
    b, v = logits.shape
    logits = logits.astype(jnp.float32) + state.logit_bias + state.constraint_bias

    # repetition penalty (divide positive / multiply negative where seen)
    seen = state.counts > 0
    rp = state.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)

    # frequency / presence penalties
    logits = logits - state.counts.astype(jnp.float32) * state.frequency_penalty[:, None]
    logits = logits - seen.astype(jnp.float32) * state.presence_penalty[:, None]

    greedy = state.temperature <= 0.0
    temp = jnp.where(greedy, 1.0, state.temperature)
    scaled = logits / temp[:, None]

    # one shared descending sort powers top-k, top-p and min-p
    sorted_logits = -jnp.sort(-scaled, axis=-1)
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)

    # top-k threshold value (k=0 → off)
    k = jnp.where(state.top_k > 0, state.top_k, v)
    kth_val = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)  # [B,1]

    # top-p: smallest prefix with cumulative prob >= top_p; find the cutoff
    # logit value = last sorted logit whose (cum - prob) < top_p
    include = (cum - probs_sorted) < state.top_p[:, None]
    # last included index per row
    idx = jnp.sum(include.astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, v - 1)
    topp_val = jnp.take_along_axis(sorted_logits, idx[:, None], axis=-1)

    # min-p: probability floor relative to the max prob
    max_logit = sorted_logits[:, :1]
    # keep tokens with prob >= min_p * max_prob ⇔ logit >= max_logit + log(min_p)
    minp_val = max_logit + jnp.log(jnp.maximum(state.min_p[:, None], 1e-20))
    minp_val = jnp.where(state.min_p[:, None] > 0, minp_val, -jnp.inf)

    threshold = jnp.maximum(jnp.maximum(kth_val, topp_val), minp_val)
    filtered = jnp.where(scaled >= threshold, scaled, NEG_INF)

    sampled = jax.random.categorical(key, filtered, axis=-1)
    argmax = jnp.argmax(logits, axis=-1)
    tokens = jnp.where(greedy, argmax, sampled).astype(jnp.int32)

    logprobs_all = jax.nn.log_softmax(logits, axis=-1)
    logprobs = jnp.take_along_axis(logprobs_all, tokens[:, None], axis=-1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(logprobs_all, TOP_LOGPROBS)

    if update is None:
        counts = state.counts.at[jnp.arange(b), tokens].add(1)
    else:
        counts = state.counts.at[jnp.arange(b), tokens].add(update)
    new_state = BatchSamplingState(
        temperature=state.temperature,
        top_k=state.top_k,
        top_p=state.top_p,
        min_p=state.min_p,
        frequency_penalty=state.frequency_penalty,
        presence_penalty=state.presence_penalty,
        repetition_penalty=state.repetition_penalty,
        counts=counts,
        logit_bias=state.logit_bias,
        constraint_bias=state.constraint_bias,
    )
    return tokens, logprobs, (top_vals, top_ids), new_state


@jax.jit
def sample(
    logits: jax.Array,  # [B, V] f32
    state: BatchSamplingState,
    key: jax.Array,
):
    """One sampling step. Returns (tokens [B], logprobs [B],
    (top_logprob_vals [B, k], top_ids [B, k]), updated state)."""
    return _sample_core(logits, state, key)


@jax.jit
def sample_row(
    logits_row: jax.Array,  # [V] f32: one sequence's logits
    slot,  # scalar i32
    state: BatchSamplingState,
    key: jax.Array,
):
    """Sample a single slot's first token from prefill logits: the row is
    scattered into the batch shape, sampled with the full per-slot state,
    and only that slot's counts absorb the token (the analog of the
    reference sampling the prompt's final-position logits directly,
    `pipeline/mod.rs` sample_causal — no bootstrap decode step)."""
    b = state.temperature.shape[0]
    full = jnp.zeros((b, logits_row.shape[-1]), jnp.float32).at[slot].set(
        logits_row
    )
    update = (jnp.arange(b) == slot).astype(jnp.int32)
    return _sample_core(full, state, key, update)


def _transformed_probs(
    logits: jax.Array,  # [B, V] f32
    state: BatchSamplingState,
) -> jax.Array:
    """Sampler-transformed probabilities for speculative acceptance
    (the reference's `speculative_target_probs`/`speculative_candidate_probs`,
    sampler.rs): temperature + top-k/top-p/min-p filtering, NO penalties or
    bias (the spec engine rejects those at admission). Greedy rows
    (temperature ≤ 0) become one-hot argmax — acceptance then reduces
    exactly to greedy token matching."""
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    greedy = state.temperature <= 0.0
    temp = jnp.where(greedy, 1.0, state.temperature)
    scaled = logits / temp[:, None]
    sorted_logits = -jnp.sort(-scaled, axis=-1)
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    k = jnp.where(state.top_k > 0, state.top_k, v)
    kth_val = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    include = (cum - probs_sorted) < state.top_p[:, None]
    idx = jnp.clip(jnp.sum(include.astype(jnp.int32), axis=-1) - 1, 0, v - 1)
    topp_val = jnp.take_along_axis(sorted_logits, idx[:, None], axis=-1)
    max_logit = sorted_logits[:, :1]
    minp_val = max_logit + jnp.log(jnp.maximum(state.min_p[:, None], 1e-20))
    minp_val = jnp.where(state.min_p[:, None] > 0, minp_val, -jnp.inf)
    threshold = jnp.maximum(jnp.maximum(kth_val, topp_val), minp_val)
    filtered = jnp.where(scaled >= threshold, scaled, NEG_INF)
    probs = jax.nn.softmax(filtered, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), v, dtype=jnp.float32)
    return jnp.where(greedy[:, None], onehot, probs)


@jax.jit
def speculative_accept(
    draft_tokens: jax.Array,  # [B, g] i32
    q: jax.Array,  # [B, g, V] draft transformed probs
    p: jax.Array,  # [B, g+1, V] target transformed probs
    key: jax.Array,
):
    """Batched acceptance sampling (Leviathan et al.; the reference's
    `finish_verified_step_stochastic`, speculative/verifier.rs:158):
    accept draft i with prob min(1, p_i/q_i); at the first rejection sample
    from the normalized residual max(p−q, 0); after g acceptances sample
    the bonus token from the target's last row.

    Returns (tokens [B, g+1], n_accepted [B], logprob of each committed
    token under the target's transformed distribution [B, g+1])."""
    b, g, v = q.shape
    ku, kr = jax.random.split(key)
    rows = jnp.arange(b)
    p_i = jnp.take_along_axis(p[:, :g], draft_tokens[..., None], axis=-1)[..., 0]
    q_i = jnp.take_along_axis(q, draft_tokens[..., None], axis=-1)[..., 0]
    ratio = jnp.where(
        q_i <= 0.0,
        jnp.where(p_i > 0.0, 1.0, 0.0),
        jnp.minimum(p_i / jnp.maximum(q_i, 1e-20), 1.0),
    )
    u = jax.random.uniform(ku, (b, g))
    accept = u <= ratio
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=-1), axis=-1)
    # residual / continuation distribution at position n_acc
    pn = jnp.take_along_axis(p, n_acc[:, None, None], axis=1)[:, 0]  # [B, V]
    q_pad = jnp.concatenate([q, jnp.zeros((b, 1, v), q.dtype)], axis=1)
    qn = jnp.take_along_axis(q_pad, n_acc[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(pn - qn, 0.0)
    total = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(total > 0, resid / jnp.maximum(total, 1e-20), pn)
    extra = jax.random.categorical(
        kr, jnp.log(jnp.maximum(resid, 1e-20)), axis=-1
    ).astype(jnp.int32)
    tokens = jnp.concatenate(
        [draft_tokens, jnp.zeros((b, 1), jnp.int32)], axis=1
    )
    tokens = tokens.at[rows, n_acc].set(extra)
    lp_all = jnp.log(jnp.maximum(p, 1e-20))
    lp = jnp.take_along_axis(lp_all, tokens[..., None], axis=-1)[..., 0]
    return tokens, n_acc, lp
