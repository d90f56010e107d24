"""Sliding-window perplexity harness — the quality-validation analog of
llama.cpp's `perplexity` tool, which the reference ecosystem uses to
validate its quantized models (mistral.rs publishes no PPL harness of its
own; UQFF quants are paired against GGUF in `releases/v0.8.2/report.md`).

Protocol (llama.cpp-compatible): the token stream is split into
non-overlapping windows of ``window`` tokens; each window is scored with a
fresh context, and NLL is accumulated for positions >= min(512, window//2)
(the "burn-in" prefix gives every scored token enough left context).
PPL = exp(mean NLL). Windows are batched and bucketed so the TPU sees a
small number of static shapes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.llama import KVCache, forward
from .generate import _freeze


def _window_nll(weights, fcfg, cache, ids, first, backend, compute_dtype):
    """ids [B, W] int32 -> (nll_sum [B], count [B]) over positions >= first.

    Position p is scored by the logits at p-1 (next-token prediction).
    """
    b, w = ids.shape
    positions = jnp.broadcast_to(jnp.arange(w)[None], (b, w)).astype(jnp.int32)
    logits, _ = forward(
        weights, fcfg, ids, positions, cache, jnp.zeros((b,), jnp.int32),
        backend=backend, compute_dtype=compute_dtype,
    )  # [B, W, V] f32
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = ids[:, 1:]  # token at p predicted from logits at p-1
    tok_nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    # scored positions: p in [first, W)
    p = jnp.arange(1, w)[None]
    mask = (p >= first).astype(jnp.float32)
    return (tok_nll * mask).sum(axis=1), jnp.broadcast_to(
        mask.sum(axis=1), (b,)
    )


def compute_perplexity(
    weights: dict,
    cfg: ModelConfig,
    token_ids: Sequence[int],
    *,
    window: int = 512,
    batch_size: int = 4,
    backend: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    burn_in: Optional[int] = None,
    progress: bool = False,
) -> dict:
    """Perplexity of ``token_ids`` under the model.

    Returns {"ppl", "nll", "tokens_scored", "windows"}; ``nll`` is the mean
    per-token negative log-likelihood in nats.
    """
    ids = np.asarray(token_ids, np.int32)
    if ids.ndim != 1:
        raise ValueError("token_ids must be a flat sequence")
    window = min(window, cfg.max_position_embeddings)
    n_win = len(ids) // window
    if n_win == 0:
        raise ValueError(
            f"need at least {window} tokens for one window, got {len(ids)}"
        )
    first = burn_in if burn_in is not None else min(512, window // 2)
    first = max(1, min(first, window - 1))
    fcfg = _freeze(cfg)

    fn = jax.jit(
        _window_nll,
        static_argnames=("fcfg", "first", "backend", "compute_dtype"),
    )
    cache = KVCache.create(cfg, batch_size, window, dtype=compute_dtype)

    total_nll = 0.0
    total_cnt = 0.0
    wins = ids[: n_win * window].reshape(n_win, window)
    for i in range(0, n_win, batch_size):
        batch = wins[i : i + batch_size]
        real = batch.shape[0]
        if real < batch_size:  # pad to the static batch shape, mask later
            batch = np.concatenate(
                [batch, np.zeros((batch_size - real, window), np.int32)]
            )
        nll, cnt = fn(
            weights, fcfg, cache, jnp.asarray(batch), first, backend,
            compute_dtype,
        )
        nll = np.asarray(nll)[:real]
        cnt = np.asarray(cnt)[:real]
        total_nll += float(nll.sum())
        total_cnt += float(cnt.sum())
        if progress:
            done = min(i + batch_size, n_win)
            print(
                f"[{done}/{n_win}] ppl so far: "
                f"{math.exp(total_nll / max(total_cnt, 1)):.4f}",
                flush=True,
            )
    return {
        "ppl": math.exp(total_nll / total_cnt),
        "nll": total_nll / total_cnt,
        "tokens_scored": int(total_cnt),
        "windows": n_win,
    }
