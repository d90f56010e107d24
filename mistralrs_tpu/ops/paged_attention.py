"""Pallas paged-decode attention (the TPU analog of the reference's
vLLM-style decode kernels, `mistralrs-paged-attn/src/cuda/
pagedattention_v1/v2_*.cu`).

One grid program per (sequence, kv-head). Each program walks the sequence's
block table (scalar-prefetched), DMAs the (head, block) K/V stripes from the
HBM pools into a double-buffered VMEM scratch, and runs online-softmax flash
accumulation for that head's query group. KV is read exactly once — no
gather materialization (the XLA fallback reads/writes it 3×).

Layouts (chosen for this kernel — see kv/paged.py):
  q:        [B, n_kv, group, head_dim]
  k/v pool: [n_kv, S_total, head_dim]   (head-major → contiguous stripes)
  block_tables (scalar prefetch): [B, W] int32
  kv_lens      (scalar prefetch): [B] int32
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    kv_lens_ref,  # [B] int32 (SMEM)
    window_ref,  # [1] int32 (SMEM): 0 → full attention
    # inputs
    q_ref,  # [1, 1, group_p, hd] VMEM block for (b, h)
    k_pool_ref,  # [n_kv, S_total, hd] in ANY/HBM
    v_pool_ref,
    # outputs
    o_ref,  # [1, 1, group_p, hd]
    # scratch
    k_buf,  # [2, bs, hd] VMEM
    v_buf,
    sem,  # DMA semaphores (2, 2)
    *,
    block_size: int,
    scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    kv_len = kv_lens_ref[b]
    n_blocks = pl.cdiv(kv_len, block_size)
    group_p, hd = q_ref.shape[2], q_ref.shape[3]

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [group_p, hd]

    def start_dma(i, slot):
        blk = block_tables_ref[b, i]
        off = blk * block_size
        k_dma = pltpu.make_async_copy(
            k_pool_ref.at[h, pl.ds(off, block_size)], k_buf.at[slot], sem.at[slot, 0]
        )
        v_dma = pltpu.make_async_copy(
            v_pool_ref.at[h, pl.ds(off, block_size)], v_buf.at[slot], sem.at[slot, 1]
        )
        k_dma.start()
        v_dma.start()

    def wait_dma(i, slot):
        blk = block_tables_ref[b, i]
        off = blk * block_size
        pltpu.make_async_copy(
            k_pool_ref.at[h, pl.ds(off, block_size)], k_buf.at[slot], sem.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_pool_ref.at[h, pl.ds(off, block_size)], v_buf.at[slot], sem.at[slot, 1]
        ).wait()

    @pl.when(n_blocks > 0)
    def _():
        start_dma(0, 0)

    def body(i, carry):
        acc, m, l = carry
        slot = i % 2

        @pl.when(i + 1 < n_blocks)
        def _():
            start_dma(i + 1, (i + 1) % 2)

        wait_dma(i, slot)
        k = k_buf[slot].astype(jnp.float32)  # [bs, hd]
        v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [group_p, bs]
        pos = i * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_size), 1
        )  # [1, bs]
        mask = pos < kv_len
        w = window_ref[0]
        mask = mask & (((kv_len - 1 - pos) < w) | (w <= 0))
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l

    acc0 = jnp.zeros((group_p, hd), jnp.float32)
    m0 = jnp.full((group_p, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((group_p, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "interpret"),
)
def paged_decode_attention(
    q: jax.Array,  # [B, n_q, hd]
    k_pool: jax.Array,  # [n_kv, S_total, hd]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, W] int32
    kv_lens: jax.Array,  # [B] int32
    window: jax.Array | int = 0,  # scalar; 0 → full attention
    *,
    block_size: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Single-token paged attention. Returns [B, n_q, hd] in q.dtype."""
    b, n_q, hd = q.shape
    n_kv = k_pool.shape[0]
    group = n_q // n_kv
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    # pad the query group to the f32 sublane quantum
    group_p = max(8, _round_up(group, 8))
    qg = q.reshape(b, n_kv, group, hd)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))

    window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_kv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group_p, hd), lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group_p, hd), lambda i, j, *_: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_size, hd), k_pool.dtype),
            pltpu.VMEM((2, block_size, hd), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_size=block_size, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group_p, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, kv_lens, window_arr, qg, k_pool, v_pool)
    return out[:, :, :group].reshape(b, n_q, hd)
