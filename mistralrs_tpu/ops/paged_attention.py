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
#: exp2-folded flash softmax: exp(x) = exp2(x·log2e) with log2e folded into
#: the QK scale (or applied post-softcap) — exp2 is the VPU-native
#: transcendental; measured −5.6% on the decode attention chain
#: (exp/exp2_probe_r5.log). Identical math: exp2(log2e·x) ≡ exp(x).
LOG2E = 1.4426950408889634


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

    # log2e folds into the scale unless softcap must see true logits
    q = q_ref[0].astype(jnp.float32) * (
        scale if softcap else scale * LOG2E
    )  # [n_kv, group_p, hd]

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
            s = jnp.tanh(s * (1.0 / softcap)) * (softcap * LOG2E)
        pos = ci * span + jax.lax.broadcasted_iota(jnp.int32, (1, 1, span), 2)
        mask = pos < kv_len
        w = window_ref[0]
        mask = mask & (((kv_len - 1 - pos) < w) | (w <= 0))
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
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
        # (log2 domain, like the folded scores)
        m0 = sinks_ref[...].astype(jnp.float32)[:, :, None] * LOG2E
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


def _prefill_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, Wp] int32 (SMEM)
    kv_lens_ref,  # [B] int32: total KV length AFTER this chunk's writes
    window_ref,  # [1] int32: 0 → full attention
    n_valid_ref,  # [B] int32: valid tokens of this chunk (≤ T_pad)
    slot_map_ref,  # [B, T_pad] int32: write slot per token (< 0 → dropped)
    layer_ref,  # [1] int32
    *refs,
    block_size: int,
    chunk: int,  # blocks per ctx fetch wave
    q_tile: int,  # query tokens per program
    scale: float,
    quantized: bool = False,
    softcap: float = 0.0,
    has_sinks: bool = False,
):
    """Paged flash attention for MULTI-token queries (chunked prefill and
    speculative verification) — the TPU analog of the reference's varlen
    FlashAttention-2 prefill (`mistralrs-flash-attn/kernels/flash_api.cu`)
    plus its gather-KV prefill kernels
    (`mistralrs-paged-attn/src/cuda/gather_kv_cache_kernel.cu`), fused with
    reshape_and_cache.

    Grid: one program per (sequence, q-tile). Past KV streams from the HBM
    pools in double-buffered chunks exactly like the decode kernel; the
    CURRENT chunk's K/V never round-trips through HBM for attention — it is
    DMA'd once per sequence into persistent scratch (border-padded by one
    block on each side), so this chunk's pool writes are order-independent
    of every read. Writes land block-by-block: pool block j's rows are ONE
    dynamic-start window of the scratch (token→row is affine with slope 1
    within a chunk's block run: row r of block j is token t_j − r_lo + r),
    so each block is a straight [n_kv, block_size, hd] DMA, with boundary
    blocks RMW-ing their partially-covered rows. With quantized pools the
    chunk is quantized ONCE per sequence (tile 0) into persistent code +
    scale scratch, and the staging scratch is overwritten in place with the
    round-tripped values the self-attention reads (numerically identical to
    write-then-re-read).

    Positions are implicit: this chunk's tokens occupy positions
    [kv_len − n_valid, kv_len) — the engine's prefill/verify invariant."""
    refs = list(refs)
    sinks_ref = None
    if quantized:
        (q_ref, k_new_ref, v_new_ref, k_pool_ref, v_pool_ref,
         kvs_pool_ref) = refs[:6]
        del refs[:6]
        if has_sinks:
            sinks_ref = refs.pop(0)
        (o_ref, k_pool_out, v_pool_out, kvs_pool_out,
         kn_scr, vn_scr, kc_scr, vc_scr, s_scr, wq_k, wq_v, wq_s,
         k_buf, v_buf, kvs_buf, wk_buf, wv_buf, wkvs_buf,
         q_scr, o_scr, acc_ref, m_ref, l_ref,
         sem, ssem, wsem, nsem, qosem) = refs
    else:
        (q_ref, k_new_ref, v_new_ref, k_pool_ref, v_pool_ref) = refs[:5]
        del refs[:5]
        if has_sinks:
            sinks_ref = refs.pop(0)
        (o_ref, k_pool_out, v_pool_out,
         kn_scr, vn_scr, wq_k, wq_v, k_buf, v_buf, wk_buf, wv_buf,
         q_scr, o_scr, acc_ref, m_ref, l_ref,
         sem, wsem, nsem, qosem) = refs
        kvs_pool_out = kvs_buf = wkvs_buf = ssem = None
        kc_scr = vc_scr = s_scr = wq_s = None

    b = pl.program_id(0)
    i = pl.program_id(1)
    li = layer_ref[0]
    bs = block_size
    n_kv = k_pool_out.shape[1]
    t_scr = kn_scr.shape[1]
    t_pad = t_scr - 2 * bs  # data lives at scratch rows [bs, bs + t_pad)
    group = q_scr.shape[1]
    rows = group * q_tile
    hd = q_scr.shape[3]
    span = chunk * bs

    kv_len = kv_lens_ref[b]
    nv = n_valid_ref[b]
    ctx = kv_len - nv  # past tokens already resident in the pool
    ta = i * q_tile
    tb = jnp.minimum(ta + q_tile, nv)
    active = ta < nv
    first_slot = slot_map_ref[b, jnp.minimum(ta, t_pad - 1)]
    do_write = active & (first_slot >= 0)
    r_a = jnp.where(first_slot >= 0, first_slot % bs, 0)

    # stage this chunk's KV rows ONCE per sequence (tile 0); later q tiles
    # of the same sequence reuse the scratch (each layer relaunches)
    kn_in = pltpu.make_async_copy(
        k_new_ref.at[b], kn_scr.at[:, pl.ds(bs, t_pad)], nsem.at[0])
    vn_in = pltpu.make_async_copy(
        v_new_ref.at[b], vn_scr.at[:, pl.ds(bs, t_pad)], nsem.at[1])

    @pl.when(i == 0)
    def _():
        kn_in.start()
        vn_in.start()

    # q/o ride manual DMAs (ANY memory): Pallas would double-buffer the
    # 2 MB pipelined blocks — 8 MB of VMEM this kernel needs elsewhere
    ta_q = i * q_tile
    q_in = pltpu.make_async_copy(
        q_ref.at[b, :, :, pl.ds(ta_q, q_tile)], q_scr, qosem.at[0])
    q_in.start()

    # --- write-block metadata (token→pool-block map of this tile) ---------
    w_n = (q_tile - 1) // bs + 2  # static bound on blocks a tile can span

    def wmeta(j):
        t_j = ta if j == 0 else ta + j * bs - r_a
        exists = do_write & (t_j < tb)
        blk = slot_map_ref[b, jnp.clip(t_j, 0, t_pad - 1)] // bs
        r_lo = r_a if j == 0 else jnp.int32(0)
        n_rows = jnp.minimum(bs - r_lo, tb - t_j)
        partial = (r_lo > 0) | (n_rows < bs)
        return t_j, exists, blk, r_lo, n_rows, partial

    def wcopies(j, blk, out):
        src = [wk_buf.at[j], wv_buf.at[j]]
        dst = [k_pool_out.at[li, :, pl.ds(blk * bs, bs)],
               v_pool_out.at[li, :, pl.ds(blk * bs, bs)]]
        if quantized:
            src.append(wkvs_buf.at[j])
            dst.append(kvs_pool_out.at[li, pl.ds(blk * bs, bs)])
        if not out:
            src, dst = dst, src
        return [pltpu.make_async_copy(s, d, wsem.at[j, n])
                for n, (s, d) in enumerate(zip(src, dst))]

    # phase A: RMW reads of partially-covered boundary blocks go out first
    # so they overlap the staging/quantize work below
    for j in range(w_n):
        _, ex, blk, _, _, partial = wmeta(j)

        @pl.when(ex & partial)
        def _(j=j, blk=blk):
            for op in wcopies(j, blk, out=False):
                op.start()

    @pl.when(i == 0)
    def _():
        kn_in.wait()
        vn_in.wait()

    # --- quantize once per sequence (1-byte pools) -------------------------
    if quantized:
        @pl.when(i == 0)
        def _():
            def qenc(x, dt):
                amax = jnp.max(jnp.abs(x), axis=-1)  # [n_kv, T_pad]
                cap = 127.0 if dt == jnp.int8 else 448.0
                s = amax / cap
                y = x / jnp.maximum(s, 1e-10)[:, :, None]
                if dt == jnp.int8:
                    y = jnp.clip(jnp.round(y), -127, 127)
                return y.astype(dt), s

            k_cur = kn_scr[:, pl.ds(bs, t_pad), :].astype(jnp.float32)
            v_cur = vn_scr[:, pl.ds(bs, t_pad), :].astype(jnp.float32)
            k_codes, k_s = qenc(k_cur, k_pool_out.dtype)
            v_codes, v_s = qenc(v_cur, v_pool_out.dtype)
            kc_scr[:, pl.ds(bs, t_pad), :] = k_codes
            vc_scr[:, pl.ds(bs, t_pad), :] = v_codes
            sw = s_scr.shape[1]
            s_scr[pl.ds(bs, t_pad), :] = jnp.concatenate(
                [jnp.swapaxes(k_s, 0, 1), jnp.swapaxes(v_s, 0, 1),
                 jnp.zeros((t_pad, sw - 2 * n_kv), jnp.float32)],
                axis=1,
            ).astype(s_scr.dtype)
            # self-attention reads the round-tripped values — numerically
            # identical to writing then re-reading the pool
            kn_scr[:, pl.ds(bs, t_pad), :] = (
                k_codes.astype(jnp.float32) * k_s[:, :, None]
            ).astype(kn_scr.dtype)
            vn_scr[:, pl.ds(bs, t_pad), :] = (
                v_codes.astype(jnp.float32) * v_s[:, :, None]
            ).astype(vn_scr.dtype)

        kw_src, vw_src = kc_scr, vc_scr
    else:
        kw_src, vw_src = kn_scr, vn_scr

    # Phase-shifted write source: Mosaic requires vector loads at sublane
    # offsets provably ≡ 0 (mod 8). The window base bs + t_j − r_lo is
    # ≡ −slot₀ (mod 8) for EVERY block and tile (slot progression is affine
    # with slope 1 and q_tile/block_size are multiples of 8), so ONE copy of
    # the write source rotated by δ = (−slot₀) mod 8 makes all window reads
    # aligned. δ = 0 on every engine prefill path (chunks start block-
    # aligned); δ ≠ 0 only for speculative verify rows. Built once per
    # sequence (tile 0), via static-slice concats under an 8-way branch.
    slot0 = slot_map_ref[b, 0]
    delta = jnp.remainder(-jnp.where(slot0 >= 0, slot0, 0), 8)

    @pl.when(i == 0)
    def _():
        for kk in range(8):
            @pl.when(delta == kk)
            def _(kk=kk):
                if kk == 0:
                    wq_k[...] = kw_src[...]
                    wq_v[...] = vw_src[...]
                    if quantized:
                        wq_s[...] = s_scr[...]
                else:
                    wq_k[...] = jnp.concatenate(
                        [kw_src[:, kk:, :], kw_src[:, :kk, :]], axis=1)
                    wq_v[...] = jnp.concatenate(
                        [vw_src[:, kk:, :], vw_src[:, :kk, :]], axis=1)
                    if quantized:
                        wq_s[...] = jnp.concatenate(
                            [s_scr[kk:, :], s_scr[:kk, :]], axis=0)

    # phase B: fill block buffers and issue the write-backs. Pool block j's
    # buffer row r holds token t_j − r_lo + r → ONE bs-row window of the
    # scratch starting at base = bs + t_j − r_lo (the ±bs border pad keeps
    # every window in bounds; border rows only land where masked/RMW'd).
    for j in range(w_n):
        _, ex, blk, r_lo, n_rows, partial = wmeta(j)

        @pl.when(ex)
        def _(j=j, blk=blk, t_j=wmeta(j)[0], r_lo=r_lo, n_rows=n_rows,
              partial=partial):
            base = pl.multiple_of(bs + t_j - r_lo - delta, 8)
            ks = wq_k[:, pl.ds(base, bs), :]
            vs = wq_v[:, pl.ds(base, bs), :]
            ss = wq_s[pl.ds(base, bs), :] if quantized else None

            @pl.when(partial)
            def _():
                for op in wcopies(j, blk, out=False):
                    op.wait()
                rsel = jax.lax.broadcasted_iota(
                    jnp.int32, wk_buf.shape[1:], 1)
                keep = (rsel >= r_lo) & (rsel < r_lo + n_rows)
                wk_buf[j] = jnp.where(keep, ks, wk_buf[j])
                wv_buf[j] = jnp.where(keep, vs, wv_buf[j])
                if quantized:
                    srsel = jax.lax.broadcasted_iota(
                        jnp.int32, wkvs_buf.shape[1:], 0)
                    skeep = (srsel >= r_lo) & (srsel < r_lo + n_rows)
                    wkvs_buf[j] = jnp.where(skeep, ss, wkvs_buf[j])

            @pl.when(jnp.logical_not(partial))
            def _():
                wk_buf[j] = ks
                wv_buf[j] = vs
                if quantized:
                    wkvs_buf[j] = ss

            for op in wcopies(j, blk, out=True):
                op.start()

    # --- flash state: VMEM refs updated in place, per-head ----------------
    # Loop-CARRIED accumulators at this scale cost several copies of
    # themselves in Mosaic stack (measured 38 MB at q_tile=256); ref-based
    # in-place updates + per-head processing keep the peak at ~1 head-tile.
    # Everything lives TRANSPOSED — scores [span, rows], acc [hd, rows],
    # m/l [1, rows] — so no per-chunk relayouts are needed anywhere: the QK
    # and PV dots contract on axis 0/1 directly and every broadcast aligns.
    if has_sinks:
        sink = sinks_ref[...].astype(jnp.float32) * LOG2E  # log2 domain
        for h in range(n_kv):
            m_ref[h] = jnp.broadcast_to(
                sink[h][:, None], (group, q_tile)).reshape(1, rows)
        l_ref[...] = jnp.ones((n_kv, 1, rows), jnp.float32)
    else:
        m_ref[...] = jnp.full((n_kv, 1, rows), NEG_INF, jnp.float32)
        l_ref[...] = jnp.zeros((n_kv, 1, rows), jnp.float32)
    acc_ref[...] = jnp.zeros((n_kv, hd, rows), jnp.float32)
    q_in.wait()
    q_scr[...] = (  # pre-scale in place (log2e folded unless softcap)
        q_scr[...].astype(jnp.float32)
        * (scale if softcap else scale * LOG2E)).astype(q_scr.dtype)

    # query positions: row r of the flattened [group, q_tile] tile is token
    # ta + (r mod q_tile), at absolute position ctx + that
    pq = ctx + ta + jnp.remainder(
        jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1), q_tile)
    w = window_ref[0]

    _QK = (((1,), (1,)), ((), ()))  # k[s,hd] · q[r,hd] → [s,r]
    _PV = (((0,), (0,)), ((), ()))  # v[s,hd] · p[s,r] → [hd,r]

    def flash_head(h, k_t, v_t, mask, ks_col=None, vs_col=None):
        """In-place online-softmax update for head h over one KV tile.
        k_t/v_t: [S, hd] bf16; mask: [S, rows]; ks/vs_col: [S, 1] scales."""
        s = jax.lax.dot_general(
            k_t, q_scr[h].reshape(rows, hd), _QK,
            preferred_element_type=jnp.float32)
        if ks_col is not None:
            s = s * ks_col
        if softcap:
            s = jnp.tanh(s * (1.0 / softcap)) * (softcap * LOG2E)
        s = jnp.where(mask, s, NEG_INF)
        m_old = m_ref[h]  # [1, rows]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
        alpha = jnp.exp2(m_old - m_new)
        p = jnp.exp2(s - m_new)
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=0, keepdims=True)
        m_ref[h] = m_new
        if vs_col is not None:
            p = p * vs_col
        pv = jax.lax.dot_general(
            v_t, p.astype(jnp.bfloat16), _PV,
            preferred_element_type=jnp.float32)
        acc_ref[h] = acc_ref[h] * alpha + pv

    # --- past-context walk (double-buffered, like the decode kernel) ------
    def dma(ci, j, slot, which):
        pool = k_pool_out if which == 0 else v_pool_out
        buf = k_buf if which == 0 else v_buf
        blk = block_tables_ref[b, ci * chunk + j]
        return pltpu.make_async_copy(
            pool.at[li, :, pl.ds(blk * bs, bs)],
            buf.at[slot, :, pl.ds(j * bs, bs)],
            sem.at[slot, which, j],
        )

    def sdma(ci, j, slot):
        blk = block_tables_ref[b, ci * chunk + j]
        return pltpu.make_async_copy(
            kvs_pool_out.at[li, pl.ds(blk * bs, bs)],
            kvs_buf.at[slot, pl.ds(j * bs, bs)],
            ssem.at[slot, j],
        )

    def start_chunk(ci, slot):
        for j in range(chunk):
            dma(ci, j, slot, 0).start()
            dma(ci, j, slot, 1).start()
        if quantized:
            for j in range(chunk):
                sdma(ci, j, slot).start()

    def wait_chunk(ci, slot):
        for j in range(chunk):
            dma(ci, j, slot, 0).wait()
            dma(ci, j, slot, 1).wait()
        if quantized:
            for j in range(chunk):
                sdma(ci, j, slot).wait()

    # a sliding window lets the walk skip chunks wholly below every query's
    # horizon (min query position of this tile is ctx + ta)
    lo_pos = jnp.where(w > 0, jnp.maximum(ctx + ta - w + 1, 0), 0)
    c0 = lo_pos // span
    n_chunks = pl.cdiv(ctx, span)
    n_chunks = jnp.where(active, n_chunks, c0)  # inactive tile: no walk

    @pl.when(c0 < n_chunks)
    def _():
        start_chunk(c0, 0)

    def ctx_body(ci, carry):
        slot = jnp.remainder(ci - c0, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            start_chunk(ci + 1, jnp.remainder(ci + 1 - c0, 2))

        wait_chunk(ci, slot)
        pos_k = ci * span + jax.lax.broadcasted_iota(
            jnp.int32, (span, 1), 0)
        mask = (pos_k < ctx) & (((pq - pos_k) < w) | (w <= 0))
        sv = kvs_buf[slot].astype(jnp.float32) if quantized else None
        for h in range(n_kv):
            flash_head(h, k_buf[slot, h].astype(jnp.bfloat16),
                       v_buf[slot, h].astype(jnp.bfloat16), mask,
                       sv[:, h][:, None] if quantized else None,
                       sv[:, n_kv + h][:, None] if quantized else None)
        return carry

    jax.lax.fori_loop(c0, n_chunks, ctx_body, 0)

    # --- current-chunk tiles (KV straight from VMEM — never re-read) ------
    span_s = min(span, t_pad)
    n_self = jnp.where(
        active, pl.cdiv(jnp.minimum(ta + q_tile, nv), span_s), 0)

    def self_body(js, carry):
        tk = js * span_s + jax.lax.broadcasted_iota(
            jnp.int32, (span_s, 1), 0)
        pos_k = ctx + tk
        mask = (tk < nv) & (pos_k <= pq) & (((pq - pos_k) < w) | (w <= 0))
        off = pl.multiple_of(bs + js * span_s, 8)  # statically 8-aligned —
        # unprovable dynamic sublane starts lower to slow relayout paths
        for h in range(n_kv):
            k_t = kn_scr[h, pl.ds(off, span_s), :].astype(jnp.bfloat16)
            v_t = vn_scr[h, pl.ds(off, span_s), :].astype(jnp.bfloat16)
            flash_head(h, k_t, v_t, mask)
        return carry

    jax.lax.fori_loop(0, n_self, self_body, 0)

    # finalize: [hd, rows] → [rows, hd] (one transpose per head, endgame)
    for h in range(n_kv):
        out_h = acc_ref[h] / jnp.maximum(l_ref[h], 1e-20)
        o_scr[h] = jnp.swapaxes(out_h, 0, 1).reshape(
            group, q_tile, hd).astype(o_scr.dtype)
    o_out = pltpu.make_async_copy(
        o_scr, o_ref.at[b, :, :, pl.ds(ta_q, q_tile)], qosem.at[1])
    o_out.start()
    o_out.wait()

    # drain the write-back DMAs before the program retires (the next
    # program may RMW a shared boundary block)
    for j in range(w_n):
        _, ex, blk, _, _, _ = wmeta(j)

        @pl.when(ex)
        def _(j=j, blk=blk):
            for op in wcopies(j, blk, out=True):
                op.wait()


def _pick_prefill_tiles(n_kv, group, hd, t_pad, bs, pool_isz, sw, budget):
    """(q_tile, chunk): the largest q tile whose resident set fits the VMEM
    budget (16 MB/core physical). q_tile is the traffic lever — each extra
    q tile re-streams the whole past context once — so it shrinks last.
    The model mirrors the kernel: per-head transposed flash (score temps
    are [span, rows] f32 ×~3 copies), ref-based acc, staged chunk scratch."""
    q_tile = min(256, _round_up(t_pad, 8))
    chunk = max(1, 256 // bs)
    while True:
        rows = group * q_tile
        span = chunk * bs
        w_n = (q_tile - 1) // bs + 2
        t_scr = t_pad + 2 * bs
        use = (
            4 * n_kv * hd * rows              # acc ref (f32)
            + 3 * 4 * span * rows             # per-head score temps (~3)
            + 2 * 2 * n_kv * rows * hd        # q_scr + o_scr (bf16)
            + 2 * 2 * n_kv * t_scr * hd       # kn/vn staging scratch (bf16)
            + 2 * 2 * n_kv * span * hd * pool_isz  # double-buffered ctx
            + 2 * w_n * n_kv * bs * hd * pool_isz  # write block buffers
            + 2 * n_kv * t_scr * hd * pool_isz     # phase-shifted source
        )
        if sw:  # quantized: code + scale scratch, their buffers, and the
            # f32 transients of the one-shot quantize pass
            use += (
                2 * n_kv * t_scr * hd         # kc/vc code scratch (1 B)
                + 2 * t_scr * sw * 2          # packed scale rows + shifted
                + 2 * span * sw + w_n * bs * sw * 2
                + 2 * 4 * n_kv * t_pad * hd   # qenc f32 transients
            )
        if use <= budget or (q_tile <= 64 and chunk <= 1):
            return q_tile, chunk
        if span > 128:
            chunk = max(1, chunk // 2)
        elif q_tile > 64:
            q_tile //= 2
        else:
            chunk = max(1, chunk // 2)



@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "q_tile", "chunk", "interpret",
                     "softcap"),
)
def paged_prefill_attention_fused(
    q: jax.Array,  # [B, T, n_q, hd]
    k_pool: jax.Array,  # [L, n_kv, S_total, hd] or [n_kv, S_total, hd]
    v_pool: jax.Array,
    k_new: jax.Array,  # [B, T, n_kv, hd] this chunk's KV rows
    v_new: jax.Array,
    slots: jax.Array,  # [B, T] int32 write slots (< 0 → dropped)
    block_tables: jax.Array,  # [B, W] int32
    kv_lens: jax.Array,  # [B] int32 (length AFTER this chunk's writes)
    n_valid: jax.Array,  # [B] int32 valid tokens of this chunk (≤ T)
    window: jax.Array | int = 0,
    layer: jax.Array | int = 0,
    kv_scale: Optional[jax.Array] = None,  # [L, S_total, SW] packed slot-major
    sinks: Optional[jax.Array] = None,  # [n_q]
    *,
    block_size: int,
    scale: Optional[float] = None,
    q_tile: Optional[int] = None,
    chunk: Optional[int] = None,
    interpret: bool = False,
    softcap: float = 0.0,
):
    """Fused reshape_and_cache + paged flash attention for t > 1 — chunked
    prefill and speculative multi-token verification. Replaces the
    3×-traffic gather-KV path (`kv/paged.py::gather_kv`): past KV streams
    once from the pools, this chunk's KV is consumed directly from VMEM, and
    the pool write rides the same kernel.

    INVARIANT (engine prefill/verify construction): each row's valid tokens
    [0, n_valid) are CONSECUTIVE sequence positions [kv_len − n_valid,
    kv_len), written to consecutive slots within each pool block. Returns
    (out [B, T, n_q, hd], k_pool, v_pool[, kv_scale])."""
    b, t, n_q, hd = q.shape
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
    pool_isz = jnp.dtype(k_pool.dtype).itemsize
    sw = kv_scale.shape[2] if quantized else 0

    t8 = _round_up(t, 8)
    if q_tile is None or chunk is None:
        import os as _os

        budget = int(_os.environ.get(
            "MRSTPU_PF_VMEM_BUDGET", str(11 * 1024 * 1024)))
        a_q, a_c = _pick_prefill_tiles(
            n_kv, group, hd, t8, block_size, pool_isz, sw, budget=budget)
        q_tile = q_tile or a_q
        chunk = chunk or a_c
    q_tile = min(q_tile, t8)
    nq_tiles = -(-t // q_tile)
    t_pad = nq_tiles * q_tile

    new_dt = jnp.bfloat16 if quantized else k_pool.dtype

    def pad_t(x, fill=0):
        if x.shape[1] == t_pad:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[1] = (0, t_pad - x.shape[1])
        return jnp.pad(x, cfg, constant_values=fill)

    qg = pad_t(q).reshape(b, t_pad, n_kv, group, hd)
    qg = jnp.transpose(qg, (0, 2, 3, 1, 4))  # [B, n_kv, group, T_pad, hd]
    k_hm = jnp.transpose(pad_t(k_new).astype(new_dt), (0, 2, 1, 3))
    v_hm = jnp.transpose(pad_t(v_new).astype(new_dt), (0, 2, 1, 3))
    slots_p = pad_t(jnp.asarray(slots, jnp.int32).reshape(b, t), fill=-1)

    span = chunk * block_size
    w = block_tables.shape[1]
    wp = _round_up(w, chunk)
    if wp != w:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, wp - w)))

    window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    n_valid_arr = jnp.asarray(n_valid, jnp.int32)
    w_n = (q_tile - 1) // block_size + 2

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # q (DMA'd per tile)
        pl.BlockSpec(memory_space=pltpu.ANY),  # k_new (scratch-resident)
        pl.BlockSpec(memory_space=pltpu.ANY),  # v_new
        pl.BlockSpec(memory_space=pltpu.ANY),  # k_pool
        pl.BlockSpec(memory_space=pltpu.ANY),  # v_pool
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # o (DMA'd per tile)
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_kv, group, t_pad, hd), q.dtype),
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    t_scr = t_pad + 2 * block_size  # ±1-block border for write windows
    scratch = [
        pltpu.VMEM((n_kv, t_scr, hd), new_dt),  # kn_scr
        pltpu.VMEM((n_kv, t_scr, hd), new_dt),  # vn_scr
    ]
    if quantized:  # per-sequence code/scale scratch (quantized at tile 0)
        scratch += [
            pltpu.VMEM((n_kv, t_scr, hd), k_pool.dtype),  # kc_scr
            pltpu.VMEM((n_kv, t_scr, hd), v_pool.dtype),  # vc_scr
            pltpu.VMEM((t_scr, sw), kv_scale.dtype),  # s_scr
        ]
    scratch += [  # phase-shifted write source (aligned window reads)
        pltpu.VMEM((n_kv, t_scr, hd), k_pool.dtype),  # wq_k
        pltpu.VMEM((n_kv, t_scr, hd), v_pool.dtype),  # wq_v
    ]
    if quantized:
        scratch += [pltpu.VMEM((t_scr, sw), kv_scale.dtype)]  # wq_s
    scratch += [
        pltpu.VMEM((2, n_kv, span, hd), k_pool.dtype),
        pltpu.VMEM((2, n_kv, span, hd), v_pool.dtype),
    ]
    inputs = [block_tables, kv_lens, window_arr, n_valid_arr, slots_p,
              layer_arr, qg, k_hm, v_hm, k_pool, v_pool]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.ANY)]
        out_shape += [jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype)]
        scratch += [pltpu.VMEM((2, span, sw), kv_scale.dtype)]
        inputs += [kv_scale]
        # 6 prefetch + q(6), k_new(7), v_new(8), pools(9,10), scales(11)
        aliases = {9: 1, 10: 2, 11: 3}
    else:
        aliases = {9: 1, 10: 2}
    has_sinks = sinks is not None
    if has_sinks:
        sg = sinks.reshape(n_kv, group).astype(jnp.float32)
        in_specs.append(pl.BlockSpec((n_kv, group),
                                     lambda bi, qi, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(sg)
    scratch += [
        pltpu.VMEM((w_n, n_kv, block_size, hd), k_pool.dtype),  # wk_buf
        pltpu.VMEM((w_n, n_kv, block_size, hd), v_pool.dtype),  # wv_buf
    ]
    if quantized:
        scratch += [pltpu.VMEM((w_n, block_size, sw), kv_scale.dtype)]
    rows = group * q_tile
    scratch += [
        pltpu.VMEM((n_kv, group, q_tile, hd), q.dtype),  # q_scr (pre-scaled)
        pltpu.VMEM((n_kv, group, q_tile, hd), q.dtype),  # o_scr
        pltpu.VMEM((n_kv, hd, rows), jnp.float32),   # acc (transposed)
        pltpu.VMEM((n_kv, 1, rows), jnp.float32),    # m
        pltpu.VMEM((n_kv, 1, rows), jnp.float32),    # l
    ]
    scratch += [pltpu.SemaphoreType.DMA((2, 2, chunk))]
    if quantized:
        scratch += [pltpu.SemaphoreType.DMA((2, chunk))]  # ssem
    scratch += [
        pltpu.SemaphoreType.DMA((w_n, 3 if quantized else 2)),  # wsem
        pltpu.SemaphoreType.DMA((2,)),  # nsem (k_new/v_new scratch fill)
        pltpu.SemaphoreType.DMA((2,)),  # qosem (q in / o out)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b, nq_tiles),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(
            _prefill_kernel, block_size=block_size, chunk=chunk,
            q_tile=q_tile, scale=scale, quantized=quantized,
            softcap=float(softcap or 0.0), has_sinks=has_sinks,
        ),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if quantized:
        out5, k_pool, v_pool, kv_scale = outs
    else:
        out5, k_pool, v_pool = outs
    if squeeze:
        k_pool = k_pool[0]
        v_pool = v_pool[0]
        if quantized:
            kv_scale = kv_scale[0]
    out = jnp.transpose(out5, (0, 3, 1, 2, 4))[:, :t].reshape(b, t, n_q, hd)
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
