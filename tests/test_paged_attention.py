"""Pallas paged-decode attention vs the gather+sdpa reference (interpret
mode on CPU; the analog of the reference's paged-attn kernel tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.kv.paged import gather_kv
from mistralrs_tpu.ops.attention import sdpa
from mistralrs_tpu.ops.paged_attention import paged_decode_attention


@pytest.mark.parametrize("window", [0, 9])
def test_matches_gather_sdpa(window):
    rng = np.random.default_rng(0)
    B, n_kv, group, hd, bs, W = 3, 2, 4, 64, 16, 8
    n_q = n_kv * group
    S_total = 16 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, 15, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([37, 5, W * bs], jnp.int32)
    out = paged_decode_attention(
        q, kp, vp, bt, kv_lens, window, block_size=bs, interpret=True
    )
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    qr = q[:, None].astype(jnp.float32)
    ref = sdpa(
        qr, kk, vv, q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens,
        sliding_window=window or None,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_mha_group1():
    """group == 1 (MHA) exercises the group-padding path."""
    rng = np.random.default_rng(1)
    B, n_kv, hd, bs, W = 2, 4, 32, 8, 4
    S_total = 8 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, 7, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([11, 29], jnp.int32)
    out = paged_decode_attention(q, kp, vp, bt, kv_lens, 0, block_size=bs, interpret=True)
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    ref = sdpa(
        q[:, None].astype(jnp.float32), kk, vv,
        q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
