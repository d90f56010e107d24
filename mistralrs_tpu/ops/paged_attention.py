"""Pallas paged-decode attention (the TPU analog of the reference's
vLLM-style decode kernels, `mistralrs-paged-attn/src/cuda/
pagedattention_v1/v2_*.cu`).

One grid program per (sequence, kv-head). Each program walks the sequence's
block table (scalar-prefetched) in CHUNKS of several blocks: all the chunk's
(head, block) K/V stripes are DMA'd concurrently from the HBM pools into a
double-buffered VMEM scratch (hiding per-DMA latency), then one flash step
processes the whole [chunk*block_size, head_dim] tile. KV is read exactly
once — no gather materialization (the XLA fallback reads/writes it 3×).

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
    slots_ref,  # [B] int32: write slot for this step's KV (< 0 → trash)
    layer_ref,  # [1] int32: which layer's pool plane to use
    *refs,
    # refs layout (quantized=False):
    #   q_ref, k_new_ref, v_new_ref, k_pool_ref, v_pool_ref,
    #   o_ref, k_pool_out, v_pool_out,
    #   k_buf, v_buf, wk_buf, wv_buf, sem, wsem
    # refs layout (quantized=True) additionally carries the packed
    # slot-major scale plane + its scratch:
    #   q_ref, k_new_ref, v_new_ref, k_pool_ref, v_pool_ref, kvs_pool_ref,
    #   o_ref, k_pool_out, v_pool_out, kvs_pool_out,
    #   k_buf, v_buf, kvs_buf, wk_buf, wv_buf, wkvs_buf,
    #   sem, ssem, wsem
    block_size: int,
    chunk: int,  # blocks fetched/processed per flash step
    scale: float,
    quantized: bool = False,
    softcap: float = 0.0,  # 0 → no attn-logit softcap (gemma2 uses 50.0)
    has_sinks: bool = False,  # per-head sink logits ride as the last input
):
    """One grid program per SEQUENCE covering all KV heads: per-program
    fixed cost (DMA issue latency, semaphore waits, loop setup) was the
    decode bottleneck at a (seq, head) grid — merging heads cuts programs
    8x and overlaps every head's block DMAs in one wave (measured 3.4 ms →
    see STATUS; the analog of the reference packing all heads into one CTA
    wave in pagedattention_v2).

    quantized=True: int8/fp8-e4m3 pools with per-(slot, head) scales packed
    into ONE slot-major plane [L, S_total, SW] (bf16; lanes 0:n_kv hold k
    scales, n_kv:2·n_kv hold v scales, SW a 128-lane multiple — the lane
    quantum makes the per-block scale DMA legal for Mosaic). The step's KV
    rows are quantized IN-kernel (abs-max per head) and both the code
    window and the scale window are RMW-written; each chunk's scales ride
    one extra DMA and fold into the flash step after the QK dot / before
    the PV dot — KV stays 1-byte in HBM end-to-end (the analog of fp8
    paged KV inside pagedattention_v2 + update_kvscales.cu)."""
    refs = list(refs)
    sinks_ref = None
    if quantized:
        (q_ref, k_new_ref, v_new_ref, k_pool_ref, v_pool_ref,
         kvs_pool_ref) = refs[:6]
        del refs[:6]
        if has_sinks:
            sinks_ref = refs.pop(0)
        (o_ref, k_pool_out, v_pool_out, kvs_pool_out,
         k_buf, v_buf, kvs_buf, wk_buf, wv_buf, wkvs_buf,
         sem, ssem, wsem) = refs
    else:
        (q_ref, k_new_ref, v_new_ref, k_pool_ref, v_pool_ref) = refs[:5]
        del refs[:5]
        if has_sinks:
            sinks_ref = refs.pop(0)
        (o_ref, k_pool_out, v_pool_out,
         k_buf, v_buf, wk_buf, wv_buf, sem, wsem) = refs
        kvs_pool_out = kvs_buf = wkvs_buf = ssem = None
    b = pl.program_id(0)
    li = layer_ref[0]
    kv_len = kv_lens_ref[b]
    n_kv = k_pool_out.shape[1]

    # reshape_and_cache fused in: each sequence's program writes its own
    # step's KV rows for ALL heads before reading its blocks. Slot < 0
    # routes to the trash row. DMA row slices must be 8-aligned, so the
    # write is a read-modify-write of the aligned 8-row window containing
    # the slot (windows never span pool blocks since block_size is a
    # multiple of 8 — no cross-sequence interference).
    s_total = k_pool_out.shape[2]
    wslot = slots_ref[b]
    wslot = jnp.where(wslot < 0, s_total - 1, wslot)
    win = pl.multiple_of((wslot // 8) * 8, 8)
    row = wslot % 8

    n_chunks = pl.cdiv(kv_len, block_size * chunk)

    def dma(ci, j, slot, which, seq=None):
        """Async copy of ALL heads' stripes for block j of chunk ci in ONE
        strided DMA ([n_kv, block_size, hd]; stride S_total·hd between head
        planes) — 1 descriptor instead of n_kv, same bytes."""
        pool = k_pool_out if which == 0 else v_pool_out
        buf = k_buf if which == 0 else v_buf
        blk = block_tables_ref[b if seq is None else seq, ci * chunk + j]
        return pltpu.make_async_copy(
            pool.at[li, :, pl.ds(blk * block_size, block_size)],
            buf.at[slot, :, pl.ds(j * block_size, block_size)],
            sem.at[slot, which, j],
        )

    def sdma(ci, j, slot, seq=None):
        """Async copy of block j's packed scale rows (slot-major [S, SW])."""
        blk = block_tables_ref[b if seq is None else seq, ci * chunk + j]
        return pltpu.make_async_copy(
            kvs_pool_out.at[li, pl.ds(blk * block_size, block_size)],
            kvs_buf.at[slot, pl.ds(j * block_size, block_size)],
            ssem.at[slot, j],
        )

    # Always fetch every block of a chunk: rows past kv_len read (padded)
    # table entry 0 — valid memory, and the flash mask zeroes their weight.
    # Fetching garbage instead would risk NaN·0 = NaN in the p @ v product.
    def start_chunk(ci, slot, seq=None):
        for j in range(chunk):
            dma(ci, j, slot, 0, seq).start()
            dma(ci, j, slot, 1, seq).start()
        if quantized:
            for j in range(chunk):
                sdma(ci, j, slot, seq).start()

    def wait_chunk(ci, slot):
        for j in range(chunk):
            dma(ci, j, slot, 0).wait()
            dma(ci, j, slot, 1).wait()
        if quantized:
            for j in range(chunk):
                sdma(ci, j, slot).wait()

    # this step's write slot lands in the LAST chunk (position kv_len−1),
    # so with >1 chunk the first chunk's reads can overlap the write RMW.
    # For b > 0 the PREVIOUS program already issued this chunk-0 fetch
    # (cross-program prefetch, below) — semaphores persist across the
    # sequential grid, so its wait_chunk(0, 0) pairs with that start.
    @pl.when((n_chunks > 1) & (b == 0))
    def _():
        start_chunk(0, 0)

    kin = pltpu.make_async_copy(
        k_pool_out.at[li, :, pl.ds(win, 8)], wk_buf, wsem.at[0]
    )
    vin = pltpu.make_async_copy(
        v_pool_out.at[li, :, pl.ds(win, 8)], wv_buf, wsem.at[1]
    )
    kin.start()
    vin.start()
    if quantized:
        skin = pltpu.make_async_copy(
            kvs_pool_out.at[li, pl.ds(win, 8)], wkvs_buf, wsem.at[2]
        )
        skin.start()
    kin.wait()
    vin.wait()

    # this step's KV rows: quantize in-kernel (per-head abs-max) when the
    # pools are 1-byte — the analog of reshape_and_cache + update_kvscales
    if quantized:
        def qenc(x, dt):
            amax = jnp.max(jnp.abs(x), axis=-1)  # [n_kv]
            cap = 127.0 if dt == jnp.int8 else 448.0
            s = amax / cap
            y = x / jnp.maximum(s, 1e-10)[:, None]
            if dt == jnp.int8:
                y = jnp.clip(jnp.round(y), -127, 127)
            return y.astype(dt), s

        k_row, k_s = qenc(k_new_ref[0].astype(jnp.float32), k_pool_out.dtype)
        v_row, v_s = qenc(v_new_ref[0].astype(jnp.float32), v_pool_out.dtype)
    else:
        k_row, v_row = k_new_ref[0], v_new_ref[0]

    # place the rows via a masked select (dynamic sublane stores are not
    # expressible in Mosaic)
    rows = jax.lax.broadcasted_iota(jnp.int32, wk_buf.shape, 1)
    sel = rows == row
    wk_buf[...] = jnp.where(
        sel, jnp.broadcast_to(k_row[:, None, :], wk_buf.shape), wk_buf[...]
    )
    wv_buf[...] = jnp.where(
        sel, jnp.broadcast_to(v_row[:, None, :], wv_buf.shape), wv_buf[...]
    )
    kout = pltpu.make_async_copy(
        wk_buf, k_pool_out.at[li, :, pl.ds(win, 8)], wsem.at[0]
    )
    vout = pltpu.make_async_copy(
        wv_buf, v_pool_out.at[li, :, pl.ds(win, 8)], wsem.at[1]
    )
    kout.start()
    vout.start()
    if quantized:
        skin.wait()
        sw = wkvs_buf.shape[1]
        # pack this step's k/v scales into one [1, SW] lane row
        row_vals = jnp.concatenate(
            [k_s[None, :], v_s[None, :],
             jnp.zeros((1, sw - 2 * n_kv), jnp.float32)],
            axis=1,
        ).astype(wkvs_buf.dtype)
        srows = jax.lax.broadcasted_iota(jnp.int32, wkvs_buf.shape, 0)
        wkvs_buf[...] = jnp.where(
            srows == row,
            jnp.broadcast_to(row_vals, wkvs_buf.shape),
            wkvs_buf[...],
        )
        skout = pltpu.make_async_copy(
            wkvs_buf, kvs_pool_out.at[li, pl.ds(win, 8)], wsem.at[2]
        )
        skout.start()
    # the write-back lands in the LAST chunk's block — its completion only
    # gates that chunk's reads, so the wait happens right before they start
    # (hiding the write latency behind all earlier chunks' flash steps)

    group_p, hd = q_ref.shape[2], q_ref.shape[3]
    span = block_size * chunk

    q = q_ref[0].astype(jnp.float32) * scale  # [n_kv, group_p, hd]

    def wait_writeback():
        kout.wait()
        vout.wait()
        if quantized:
            skout.wait()

    # single-chunk case: the write block IS (or may be) in chunk 0 — its
    # reads must start after the write RMW completes
    @pl.when(n_chunks <= 1)
    def _():
        wait_writeback()

    # kv_len == 0 (a dead batch slot) means n_chunks == 0: the flash loop
    # below runs zero times, so a chunk-0 fetch would never be waited on —
    # leaked DMA semaphores abort the program on hardware (and can wedge
    # the chip for later launches). Only fetch when a chunk will consume it.
    @pl.when(n_chunks == 1)
    def _():
        start_chunk(0, 0)

    _BDN = (((2,), (2,)), ((0,), (0,)))  # q[n,g,hd] @ k[n,s,hd] → [n,g,s]
    _BPV = (((2,), (1,)), ((0,), (0,)))  # p[n,g,s] @ v[n,s,hd] → [n,g,hd]

    def body(ci, carry):
        acc, m, l = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            @pl.when(ci + 2 == n_chunks)
            def _():
                # about to fetch the LAST chunk — it contains this step's
                # write block, so the RMW write-back must have landed
                wait_writeback()

            start_chunk(ci + 1, (ci + 1) % 2)

        wait_chunk(ci, slot)
        k = k_buf[slot].astype(jnp.float32)  # [n_kv, span, hd]
        v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, _BDN, preferred_element_type=jnp.float32
        )  # [n_kv, group_p, span]
        if quantized:
            # per-row scales fold in AFTER the QK dot (q·(k·s) == (q·k)·s)
            sv = kvs_buf[slot].astype(jnp.float32)  # [span, SW]
            ks_t = jnp.swapaxes(sv[:, :n_kv], 0, 1)  # [n_kv, span]
            vs_t = jnp.swapaxes(sv[:, n_kv:2 * n_kv], 0, 1)
            s = s * ks_t[:, None, :]
        if softcap:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        pos = ci * span + jax.lax.broadcasted_iota(jnp.int32, (1, 1, span), 2)
        mask = pos < kv_len
        w = window_ref[0]
        mask = mask & (((kv_len - 1 - pos) < w) | (w <= 0))
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        if quantized:
            # v's scale folds into p before the PV dot ((p·s)·v == p·(s·v))
            p = p * vs_t[:, None, :]
        acc = acc * alpha + jax.lax.dot_general(
            p, v, _BPV, preferred_element_type=jnp.float32
        )
        return acc, m_new, l

    acc0 = jnp.zeros((n_kv, group_p, hd), jnp.float32)
    if has_sinks:
        # sink logit seeds the running max/denominator: softmax over
        # [scores, sink] with the sink's value contribution discarded —
        # exactly sdpa's concat-then-drop semantics in flash form
        m0 = sinks_ref[...].astype(jnp.float32)[:, :, None]
        l0 = jnp.ones((n_kv, group_p, 1), jnp.float32)
    else:
        m0 = jnp.full((n_kv, group_p, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((n_kv, group_p, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_chunks, body, (acc0, m0, l0))

    # cross-program prefetch: all buffers are free once the loop retires, so
    # issue sequence b+1's chunk-0 fetch NOW — its data is in flight through
    # this program's output copy and the next program's entry + write-RMW
    # setup, hiding the next program's DMA-latency bubble. Only when seq
    # b+1 has >1 chunks: its chunk 0 then cannot contain its write block,
    # so fetching before its RMW lands is race-free (sequences never write
    # shared blocks — prefix blocks are copy-on-write, refcount 1 to write).
    nb = b + 1
    nb_safe = jnp.minimum(nb, pl.num_programs(0) - 1)
    next_len = kv_lens_ref[nb_safe]
    span_i = block_size * chunk

    @pl.when((nb < pl.num_programs(0)) & (next_len > span_i))
    def _():
        start_chunk(0, 0, seq=nb_safe)

    o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "chunk", "interpret", "softcap"),
)
def paged_decode_attention_fused(
    q: jax.Array,  # [B, n_q, hd]
    k_pool: jax.Array,  # [L, n_kv, S_total, hd] or [n_kv, S_total, hd]
    v_pool: jax.Array,
    k_new: jax.Array,  # [B, n_kv, hd] this step's KV rows
    v_new: jax.Array,
    slots: jax.Array,  # [B] int32 write slots (< 0 → dropped)
    block_tables: jax.Array,  # [B, W] int32
    kv_lens: jax.Array,  # [B] int32 (length AFTER this step's write)
    window: jax.Array | int = 0,  # scalar; 0 → full attention
    layer: jax.Array | int = 0,  # which layer plane of a 4-D pool
    kv_scale: Optional[jax.Array] = None,  # [L, S_total, SW] packed slot-major
    # scales for int8/fp8 pools: lanes 0:n_kv = k, n_kv:2n_kv = v
    sinks: Optional[jax.Array] = None,  # [n_q] per-head sink logits (gpt_oss)
    *,
    block_size: int,
    scale: Optional[float] = None,
    chunk: Optional[int] = None,
    interpret: bool = False,
    softcap: float = 0.0,  # attn-logit softcap (gemma2)
):
    """Fused reshape_and_cache + paged flash decode. The FULL multi-layer
    pools pass through with input/output aliasing and only the selected
    layer plane is touched — KV is written and read exactly once, with no
    XLA slicing/stacking of pool planes under the layer scan.

    With ``kv_scale`` the pools are int8/fp8-e4m3: the step's KV is
    quantized in-kernel and scales fold into the flash step (KV traffic
    halves vs bf16). Returns (out [B, n_q, hd], k_pool, v_pool[,
    kv_scale])."""
    b, n_q, hd = q.shape
    quantized = kv_scale is not None
    squeeze = k_pool.ndim == 3
    if squeeze:
        k_pool = k_pool[None]
        v_pool = v_pool[None]
        if quantized:
            kv_scale = kv_scale[None]
    n_kv = k_pool.shape[1]
    group = n_q // n_kv
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if chunk is None:
        # target ~512 KV rows per flash step, capped so the double-buffered
        # all-heads scratch (2 slots × (K+V) × n_kv × span × hd × itemsize)
        # stays within ~6 MB of VMEM
        isz = jnp.dtype(k_pool.dtype).itemsize
        chunk = max(1, min(block_tables.shape[1], 512 // block_size))
        while chunk > 1 and (
            2 * 2 * n_kv * chunk * block_size * hd * isz > 6 * 1024 * 1024
        ):
            chunk //= 2
    # pad the query group to the f32 sublane quantum
    group_p = max(8, _round_up(group, 8))
    qg = q.reshape(b, n_kv, group, hd)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
    # table width must cover whole chunks so in-bounds reads stay valid
    w = block_tables.shape[1]
    wp = _round_up(w, chunk)
    if wp != w:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, wp - w)))

    window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    span = chunk * block_size
    in_specs = [
        pl.BlockSpec((1, n_kv, group_p, hd), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_kv, hd), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_kv, hd), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, n_kv, group_p, hd), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_kv, group_p, hd), q.dtype),
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    scratch = [
        pltpu.VMEM((2, n_kv, span, hd), k_pool.dtype),
        pltpu.VMEM((2, n_kv, span, hd), v_pool.dtype),
    ]
    inputs = [block_tables, kv_lens, window_arr,
              jnp.asarray(slots, jnp.int32), layer_arr, qg,
              k_new.astype(jnp.bfloat16 if quantized else k_pool.dtype),
              v_new.astype(jnp.bfloat16 if quantized else v_pool.dtype),
              k_pool, v_pool]
    if quantized:
        sw = kv_scale.shape[2]
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY)]  # packed scales
        out_specs += [pl.BlockSpec(memory_space=pltpu.ANY)]
        out_shape += [jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype)]
        scratch += [
            pltpu.VMEM((2, span, sw), kv_scale.dtype),  # kvs_buf
        ]
        inputs += [kv_scale]
        # args: 5 prefetch + q(5), k_new(6), v_new(7), pools(8,9), scales(10)
        aliases = {8: 1, 9: 2, 10: 3}
    else:
        aliases = {8: 1, 9: 2}
    has_sinks = sinks is not None
    if has_sinks:
        sg = sinks.reshape(n_kv, group).astype(jnp.float32)
        if group_p != group:
            # padded query rows still flow through softmax (sliced out after);
            # reuse the head's sink so they can't overflow
            sg = jnp.pad(sg, ((0, 0), (0, group_p - group)), mode="edge")
        in_specs.append(pl.BlockSpec((n_kv, group_p), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(sg)
    scratch += [
        pltpu.VMEM((n_kv, 8, hd), k_pool.dtype),  # wk_buf
        pltpu.VMEM((n_kv, 8, hd), v_pool.dtype),  # wv_buf
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((8, kv_scale.shape[2]), kv_scale.dtype),  # wkvs_buf
        ]
    scratch += [pltpu.SemaphoreType.DMA((2, 2, chunk))]
    if quantized:
        scratch += [pltpu.SemaphoreType.DMA((2, chunk))]  # ssem
    scratch += [pltpu.SemaphoreType.DMA((3 if quantized else 2,))]  # wsem

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(
            _decode_kernel, block_size=block_size, chunk=chunk, scale=scale,
            quantized=quantized, softcap=float(softcap or 0.0),
            has_sinks=has_sinks,
        ),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    if quantized:
        out4, k_pool, v_pool, kv_scale = outs
    else:
        out4, k_pool, v_pool = outs
    if squeeze:
        k_pool = k_pool[0]
        v_pool = v_pool[0]
        if quantized:
            kv_scale = kv_scale[0]
    out = out4[:, :, :group].reshape(b, n_q, hd)
    if quantized:
        return out, k_pool, v_pool, kv_scale
    return out, k_pool, v_pool


def paged_decode_attention(
    q, k_pool, v_pool, block_tables, kv_lens, window=0,
    kv_scale=None, sinks=None, *,
    block_size, scale=None, chunk=None, interpret=False, softcap=0.0
):
    """Read-only variant (testing): no KV write, pools unchanged."""
    new_dt = jnp.bfloat16 if kv_scale is not None else k_pool.dtype
    outs = paged_decode_attention_fused(
        q, k_pool, v_pool,
        jnp.zeros((q.shape[0], k_pool.shape[0], q.shape[2]), new_dt),
        jnp.zeros((q.shape[0], v_pool.shape[0], q.shape[2]), new_dt),
        jnp.full((q.shape[0],), -1, jnp.int32),
        block_tables, kv_lens, window, 0, kv_scale, sinks,
        block_size=block_size, scale=scale, chunk=chunk, interpret=interpret,
        softcap=softcap,
    )
    return outs[0]
