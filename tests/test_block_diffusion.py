"""Block diffusion: canvas commit mechanics, confidence schedule, progress
streaming, bidirectional denoiser invariants (the analog of the reference's
`block_diffusion.rs` driver)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.block_diffusion import (
    block_diffusion_generate,
    denoise_block,
    make_bidirectional_denoiser,
)
from mistralrs_tpu.models import ModelConfig, init_random_weights

MASK = 63
EOS = 62
CFG = ModelConfig(
    arch="llama", vocab_size=64, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    max_position_embeddings=256,
)
WEIGHTS = init_random_weights(CFG, seed=88, dtype=jnp.float32)


def test_denoise_block_commits_everything():
    fn = make_bidirectional_denoiser(WEIGHTS, CFG)
    prompt = [3, 17, 40]
    canvas = np.asarray(prompt + [MASK] * 8, np.int64)
    steps = []
    out = denoise_block(
        fn, canvas, len(prompt), MASK, num_steps=4,
        on_progress=lambda s, tot, toks, fin: steps.append((s, len(toks), fin)),
    )
    # prompt untouched, every mask resolved
    np.testing.assert_array_equal(out[:3], prompt)
    assert (out[3:] != MASK).all()
    # linear schedule: committed counts grow to the full block, finishing once
    assert [s for s, _, _ in steps] == [1, 2, 3, 4]
    counts = [c for _, c, _ in steps]
    assert counts == sorted(counts) and counts[-1] == 8
    assert steps[-1][2] is True and not any(f for _, _, f in steps[:-1])


def test_block_generate_stops_at_eos_and_streams():
    """A denoiser that always predicts EOS ends after one block."""

    def fake_denoiser(ids):
        b, t = ids.shape
        logits = np.zeros((b, t, 64), np.float32)
        logits[..., EOS] = 10.0
        return logits

    events = []
    out = block_diffusion_generate(
        fake_denoiser, [1, 2, 3], mask_token_id=MASK, block_len=6,
        num_steps=3, max_tokens=30, eos_token_id=EOS,
        on_progress=lambda *a: events.append(a),
    )
    assert out == []  # EOS at slot 0 → empty completion
    assert events[-1][4] is True  # final_block flagged


def test_block_generate_max_tokens():
    def fake_denoiser(ids):
        b, t = ids.shape
        logits = np.zeros((b, t, 64), np.float32)
        logits[..., 7] = 5.0
        return logits

    out = block_diffusion_generate(
        fake_denoiser, [1], mask_token_id=MASK, block_len=4, num_steps=2,
        max_tokens=10, eos_token_id=EOS,
    )
    assert out == [7] * 10


def test_bidirectional_attention_actually_bidirectional():
    """With bidirectional=True, changing a LATER token changes an earlier
    position's logits (impossible under causal masking)."""
    from mistralrs_tpu.models.llama import KVCache, forward

    ids1 = jnp.asarray([[3, 17, 40, 9]], jnp.int32)
    ids2 = jnp.asarray([[3, 17, 40, 55]], jnp.int32)
    pos = jnp.arange(4)[None].astype(jnp.int32)

    def run(ids, bidir):
        cache = KVCache.create(CFG, 1, 4, dtype=jnp.float32)
        out, _ = forward(WEIGHTS, CFG, ids, pos, cache,
                         jnp.zeros((1,), jnp.int32), compute_dtype=jnp.float32,
                         bidirectional=bidir)
        return np.asarray(out)

    causal1, causal2 = run(ids1, False), run(ids2, False)
    np.testing.assert_array_equal(causal1[0, 0], causal2[0, 0])  # causal: no leak
    bid1, bid2 = run(ids1, True), run(ids2, True)
    assert not np.allclose(bid1[0, 0], bid2[0, 0])  # bidirectional: leak
