"""Speculative decoding — draft/target pipeline pair with acceptance
sampling (the analog of `mistralrs-core/src/speculative/`:
`SpeculativeConfig` config.rs:11, driver driver.rs:18, acceptance
`try_sample_speculative_causal_gen` pipeline/mod.rs:1265).

TPU design: the draft rolls out γ tokens autoregressively (tiny model →
latency-bound, fine), then the target verifies all γ+1 positions in ONE
forward — turning γ sequential HBM sweeps of the big model into one.
Acceptance follows Leviathan et al.: accept token i with prob
min(1, p_target/p_draft); on first rejection resample from
normalize(max(p_target − p_draft, 0)). KV rollback is free with the
contiguous cache: stale entries are simply overwritten at the rolled-back
``kv_start``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .generate import _freeze
from .models.config import ModelConfig
from .models.llama import KVCache, forward


@dataclass
class SpeculativeConfig:
    gamma: int = 4  # draft tokens per verification step


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "compute_dtype", "n"))
def _forward_n(weights, cfg, ids, start_pos, cache, backend, compute_dtype, n):
    """Forward `n` tokens starting at scalar position start_pos (batch 1).
    Returns (logits [1, n, V], cache)."""
    positions = (start_pos + jnp.arange(n))[None, :]
    kv_start = jnp.full((1,), start_pos, jnp.int32)
    return forward(
        weights, cfg, ids, positions, cache, kv_start,
        backend=backend, logits_last_only=False, compute_dtype=compute_dtype,
    )


def _sample_from_probs(probs: np.ndarray, rng: np.random.Generator) -> int:
    p = probs / probs.sum()
    return int(rng.choice(p.shape[-1], p=p))


def speculative_generate(
    target_weights: dict,
    target_cfg: ModelConfig,
    draft_weights: dict,
    draft_cfg: ModelConfig,
    prompt_ids: list[int],
    *,
    max_new_tokens: int = 64,
    gamma: int = 4,
    temperature: float = 0.0,
    seed: int = 0,
    backend: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    stop_tokens: Optional[set[int]] = None,
    collect_stats: bool = False,
):
    """Single-sequence speculative decoding. Greedy (T=0) is exactly
    equivalent to target-only decoding; T>0 matches the target distribution
    by the rejection-sampling construction. Returns tokens (and stats)."""
    assert target_cfg.vocab_size == draft_cfg.vocab_size
    rng = np.random.default_rng(seed)
    stops = stop_tokens if stop_tokens is not None else set(target_cfg.eos_token_ids)
    t_cfg, d_cfg = _freeze(target_cfg), _freeze(draft_cfg)

    ids = list(prompt_ids)
    capacity = min(
        target_cfg.max_position_embeddings, len(ids) + max_new_tokens + gamma + 2
    )
    t_cache = KVCache.create(target_cfg, 1, capacity, dtype=compute_dtype)
    d_cache = KVCache.create(draft_cfg, 1, capacity, dtype=compute_dtype)

    def probs_of(logits: np.ndarray) -> np.ndarray:
        if temperature <= 0:
            out = np.zeros_like(logits)
            out[np.arange(logits.shape[0]), logits.argmax(-1)] = 1.0
            return out
        x = logits / temperature
        x = x - x.max(-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    # prefill both models on the prompt
    t0 = len(ids)
    lg, t_cache = _forward_n(
        target_weights, t_cfg, jnp.asarray([ids], jnp.int32), jnp.int32(0),
        t_cache, backend, compute_dtype, t0,
    )
    _, d_cache = _forward_n(
        draft_weights, d_cfg, jnp.asarray([ids], jnp.int32), jnp.int32(0),
        d_cache, backend, compute_dtype, t0,
    )
    last_target_probs = probs_of(np.asarray(lg)[0, -1:])[0]

    out: list[int] = []
    n_accepted = n_drafted = 0
    # position of the next token to be generated
    pos = t0
    # sample the first token directly from the target's prefill logits
    first = _sample_from_probs(last_target_probs, rng)
    out.append(first)
    ids.append(first)

    while len(out) < max_new_tokens and out[-1] not in stops:
        g = min(gamma, max_new_tokens - len(out))
        if g == 0:
            break
        # --- draft rollout: g tokens, keeping draft probs -------------------
        draft_tokens: list[int] = []
        draft_probs: list[np.ndarray] = []
        cur = ids[-1]
        dpos = pos
        for _ in range(g):
            dlg, d_cache = _forward_n(
                draft_weights, d_cfg, jnp.asarray([[cur]], jnp.int32),
                jnp.int32(dpos), d_cache, backend, compute_dtype, 1,
            )
            p = probs_of(np.asarray(dlg)[0])[0]
            cur = _sample_from_probs(p, rng)
            draft_tokens.append(cur)
            draft_probs.append(p)
            dpos += 1
        n_drafted += g

        # --- target verification: one forward over [last, d0..d_{g-1}] -----
        block = [ids[-1]] + draft_tokens
        tlg, t_cache = _forward_n(
            target_weights, t_cfg, jnp.asarray([block], jnp.int32),
            jnp.int32(pos), t_cache, backend, compute_dtype, len(block),
        )
        tp = probs_of(np.asarray(tlg)[0])  # [g+1, V]; tp[i] predicts block[i+1]

        # --- acceptance loop ------------------------------------------------
        accepted = 0
        for i, (tok, dp) in enumerate(zip(draft_tokens, draft_probs)):
            p_t, p_d = float(tp[i][tok]), float(dp[tok])
            if p_d <= 0 or rng.random() < min(1.0, p_t / max(p_d, 1e-20)):
                out.append(tok)
                ids.append(tok)
                accepted += 1
                if tok in stops or len(out) >= max_new_tokens:
                    break
            else:
                residual = np.maximum(tp[i] - dp, 0.0)
                if residual.sum() <= 0:
                    residual = tp[i]
                tok2 = _sample_from_probs(residual, rng)
                out.append(tok2)
                ids.append(tok2)
                break
        else:
            # all g accepted → bonus token from the target's last position
            if len(out) < max_new_tokens and out[-1] not in stops:
                bonus = _sample_from_probs(tp[g], rng)
                out.append(bonus)
                ids.append(bonus)
        n_accepted += accepted
        # roll back both caches to the last committed token: the target wrote
        # KV for the whole block; accepted prefix stays, the rest is
        # overwritten next round by construction of kv_start
        pos = t0 + len(out) - 1
        # draft cache similarly: its next write starts at pos

    tokens = out[: max_new_tokens]
    # trim at stop token
    for i, t in enumerate(tokens):
        if t in stops:
            tokens = tokens[: i + 1]
            break
    if collect_stats:
        return tokens, {
            "drafted": n_drafted,
            "accepted": n_accepted,
            "acceptance_rate": n_accepted / max(n_drafted, 1),
        }
    return tokens
