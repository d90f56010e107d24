"""Pallas fused MLA paged-decode kernel (the TPU analog of the reference's
MLA paged kernels: `mistralrs-paged-attn/src/cuda/concat_and_cache_mla.cu`
+ `flashinfer_mla_decode.cu`, and `mistralrs-core/src/mla/`).

Absorbed MLA is MQA over ONE combined row per token —
``[compressed_latent ‖ roped k_pe]`` — shared by every query head:
scores = q_comb · row, values = row[:rank]. That collapses the generic
paged-decode kernel's (head × block) DMA wave to one stripe per block and
makes the PV product a plain slice of the already-resident K tile: the
latent pool is read exactly once per step (the XLA gather fallback
materializes ``pool[gather_slots]`` in f32 — 3x+ the traffic, exactly
where DeepSeek-class serving is bandwidth-bound).

Layouts:
  q:    [B, nh, D_pad]   combined query, zero-padded to a lane multiple
  pool: [Lseg, S_total, D_pad] paged rows (+ trailing trash block)
  row:  [B, D_pad]       this step's combined row (fused reshape_and_cache)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mla_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32
    kv_lens_ref,  # [B] int32
    slots_ref,  # [B] int32 (< 0 → trash row)
    layer_ref,  # [1] int32
    # inputs
    q_ref,  # [1, nh_p, D]
    row_ref,  # [1, D]
    pool_ref,  # ANY
    # outputs
    o_ref,  # [1, nh_p, rank]
    pool_out,  # ANY (aliased)
    # scratch
    buf,  # [2, span, D]
    wbuf,  # [8, D]
    sem,  # DMA [2, chunk]
    wsem,  # DMA [1]
    *,
    block_size: int,
    chunk: int,
    scale: float,
    rank: int,
):
    b = pl.program_id(0)
    li = layer_ref[0]
    kv_len = kv_lens_ref[b]
    s_total = pool_out.shape[1]

    # fused concat_and_cache: RMW the aligned 8-row window with this row
    wslot = slots_ref[b]
    wslot = jnp.where(wslot < 0, s_total - 1, wslot)
    win = pl.multiple_of((wslot // 8) * 8, 8)
    row = wslot % 8

    span = block_size * chunk
    n_chunks = pl.cdiv(kv_len, span)

    def dma(ci, j, slot):
        blk = block_tables_ref[b, ci * chunk + j]
        return pltpu.make_async_copy(
            pool_out.at[li, pl.ds(blk * block_size, block_size)],
            buf.at[slot, pl.ds(j * block_size, block_size)],
            sem.at[slot, j],
        )

    def start_chunk(ci, slot):
        for j in range(chunk):
            dma(ci, j, slot).start()

    def wait_chunk(ci, slot):
        for j in range(chunk):
            dma(ci, j, slot).wait()

    @pl.when(n_chunks > 1)
    def _():
        start_chunk(0, 0)

    rin = pltpu.make_async_copy(
        pool_out.at[li, pl.ds(win, 8)], wbuf, wsem.at[0]
    )
    rin.start()
    rin.wait()
    rows_i = jax.lax.broadcasted_iota(jnp.int32, wbuf.shape, 0)
    wbuf[...] = jnp.where(
        rows_i == row,
        jnp.broadcast_to(row_ref[0][None, :], wbuf.shape),
        wbuf[...],
    )
    rout = pltpu.make_async_copy(
        wbuf, pool_out.at[li, pl.ds(win, 8)], wsem.at[0]
    )
    rout.start()

    @pl.when(n_chunks <= 1)
    def _():
        rout.wait()
        start_chunk(0, 0)

    from .paged_attention import LOG2E

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # [nh_p, D]
    nh_p = q_ref.shape[1]

    def body(ci, carry):
        acc, m, l = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            @pl.when(ci + 2 == n_chunks)
            def _():
                rout.wait()  # last chunk holds this step's write block

            start_chunk(ci + 1, (ci + 1) % 2)

        wait_chunk(ci, slot)
        k = buf[slot].astype(jnp.float32)  # [span, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [nh_p, span]
        pos = ci * span + jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, k[:, :rank], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l

    acc0 = jnp.zeros((nh_p, rank), jnp.float32)
    m0 = jnp.full((nh_p, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((nh_p, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_chunks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("rank", "block_size", "scale", "chunk", "interpret"),
)
def mla_decode_fused(
    q: jax.Array,  # [B, nh, D_pad]
    pool: jax.Array,  # [Lseg, S_total, D_pad]
    row_new: jax.Array,  # [B, D_pad] this step's combined rows
    slots: jax.Array,  # [B] int32 (< 0 → dropped)
    block_tables: jax.Array,  # [B, W] int32
    kv_lens: jax.Array,  # [B] int32 (length AFTER this step's write)
    layer: jax.Array | int = 0,
    *,
    rank: int,
    block_size: int,
    scale: float,
    chunk: Optional[int] = None,
    interpret: bool = False,
):
    """Fused write + MLA flash decode over the paged latent pool.

    Returns ``(out [B, nh, rank], pool)`` with the pool updated in place
    (input/output aliasing)."""
    b, nh, d = q.shape
    if chunk is None:
        # one combined stripe per block; ~1 MB double-buffered scratch
        isz = jnp.dtype(pool.dtype).itemsize
        chunk = max(1, min(block_tables.shape[1], 512 // block_size))
        while chunk > 1 and 2 * chunk * block_size * d * isz > 4 * 1024 * 1024:
            chunk //= 2
    nh_p = max(8, _round_up(nh, 8))
    if nh_p != nh:
        q = jnp.pad(q, ((0, 0), (0, nh_p - nh), (0, 0)))
    w = block_tables.shape[1]
    wp = _round_up(w, chunk)
    if wp != w:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, wp - w)))
    span = chunk * block_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nh_p, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, nh_p, rank), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, span, d), pool.dtype),
            pltpu.VMEM((8, d), pool.dtype),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out, pool = pl.pallas_call(
        functools.partial(
            _mla_kernel, block_size=block_size, chunk=chunk, scale=scale,
            rank=rank,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nh_p, rank), q.dtype),
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        ),
        # args: 4 prefetch + q(4), row(5), pool(6) → alias pool to output 1
        input_output_aliases={6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        block_tables, kv_lens, jnp.asarray(slots, jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        q.astype(pool.dtype), row_new.astype(pool.dtype), pool,
    )
    return out[:, :nh], pool
