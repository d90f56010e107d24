"""Block-diffusion text generation — the analog of the reference's
block-diffusion support (`mistralrs-core/src/block_diffusion.rs` +
`Pipeline::sample_block_gen`): instead of sampling one token per step, the
model denoises a whole masked block per engine step, committing the most
confident positions each denoising iteration and streaming progress.

Driver mechanics mirrored from the reference: a canvas of
``prompt + [mask]*block_len``; per denoising step the model scores every
still-masked slot bidirectionally, the top-confidence slots commit their
argmax tokens on a linear schedule, and a progress callback receives
``(step, total_steps, committed_tokens, finished, final_block)``. When a
block finishes it is appended to the context and the next block starts,
until EOS lands in a committed block or ``max_tokens`` is reached.

Any decoder with a diffusion-trained checkpoint plugs in through
``denoise_fn(canvas_ids [B,T]) -> logits [B,T,V]``;
``make_bidirectional_denoiser`` adapts the shared llama-superfamily forward
(full attention over the canvas, RoPE on true positions)."""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.llama import KVCache, forward


def make_bidirectional_denoiser(
    weights: dict, cfg: ModelConfig, compute_dtype=jnp.float32
) -> Callable[[np.ndarray], np.ndarray]:
    """denoise_fn over the shared decoder with bidirectional attention."""

    @jax.jit
    def run(ids):
        b, t = ids.shape
        cache = KVCache.create(cfg, b, t, dtype=compute_dtype)
        logits, _ = forward(
            weights, cfg, ids,
            jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32),
            cache, jnp.zeros((b,), jnp.int32), compute_dtype=compute_dtype,
            bidirectional=True,
        )
        return logits

    return lambda ids: np.asarray(run(jnp.asarray(ids, jnp.int32)))


def denoise_block(
    denoise_fn,
    canvas: np.ndarray,  # [T] int; masked slots hold mask_token_id
    block_start: int,
    mask_token_id: int,
    num_steps: int,
    on_progress=None,
    total_len: Optional[int] = None,
) -> np.ndarray:
    """Iteratively commit the block's most confident slots (linear schedule:
    after step s, ceil(B·s/S) slots are committed). Returns the canvas with
    the block fully committed."""
    canvas = canvas.copy()
    block = slice(block_start, len(canvas) if total_len is None else total_len)
    block_len = block.stop - block.start
    for step in range(1, num_steps + 1):
        masked = canvas[block] == mask_token_id
        if not masked.any():
            break
        logits = denoise_fn(canvas[None])[0, block]
        probs = np.exp(
            logits - logits.max(-1, keepdims=True)
        )
        probs /= probs.sum(-1, keepdims=True)
        best = probs.argmax(-1)
        conf = probs.max(-1)
        conf = np.where(masked, conf, -np.inf)
        target_committed = math.ceil(block_len * step / num_steps)
        n_commit = max(0, target_committed - int((~masked).sum()))
        if step == num_steps:
            n_commit = int(masked.sum())  # commit everything left
        if n_commit > 0:
            commit_idx = np.argsort(-conf)[:n_commit]
            canvas[block.start + commit_idx] = best[commit_idx]
        if on_progress is not None:
            committed = canvas[block][canvas[block] != mask_token_id]
            on_progress(step, num_steps, committed.tolist(),
                        bool((canvas[block] != mask_token_id).all()))
    return canvas


def block_diffusion_generate(
    denoise_fn,
    prompt_ids: list[int],
    *,
    mask_token_id: int,
    block_len: int = 32,
    num_steps: int = 8,
    max_tokens: int = 128,
    eos_token_id: Optional[int] = None,
    on_progress=None,  # (step, total, tokens, finished, final_block)
) -> list[int]:
    """Generate by committing denoised blocks until EOS or max_tokens."""
    out: list[int] = []
    ctx = list(prompt_ids)
    while len(out) < max_tokens:
        start = len(ctx)
        canvas = np.asarray(ctx + [mask_token_id] * block_len, np.int64)

        def progress(step, total, toks, finished):
            if on_progress is not None:
                on_progress(step, total, toks, finished, False)

        canvas = denoise_block(
            denoise_fn, canvas, start, mask_token_id, num_steps,
            on_progress=progress,
        )
        block = canvas[start:].tolist()
        if eos_token_id is not None and eos_token_id in block:
            block = block[: block.index(eos_token_id)]
            out.extend(block)
            if on_progress is not None:
                on_progress(num_steps, num_steps, block, True, True)
            break
        out.extend(block)
        ctx = canvas.tolist()
        if on_progress is not None:
            on_progress(num_steps, num_steps, block, True,
                        len(out) >= max_tokens)
    return out[:max_tokens]
