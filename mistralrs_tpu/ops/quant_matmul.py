"""Fused dequant + matmul — the TPU analog of the reference's quantized GEMM
kernel families (MMQ/MMVQ `mistralrs-quant/kernels/mmq_gguf/`, Marlin
`kernels/marlin/`, packed-affine `kernels/gguf_affine_packed/`).

Design (see `/opt/skills/guides/pallas_guide.md`):

* Weights live in HBM as K-major integer codes (half the bytes of bf16 for
  4-bit). A code tile ``[TK, TN]`` is DMA'd to VMEM, dequantized at VPU speed
  (scale expansion is a *sublane* broadcast — no lane shuffles), and fed
  straight to the MXU as the canonical ``x[TM, TK] @ w[TK, TN]`` contraction.
  Dequantized weights never touch HBM. Decode (small M) is HBM-bound and wins
  by the packing ratio; prefill (large M) runs at bf16 MXU speed.
* Split-half nibble packing (see ``quant/qtensor.py``) unpacks into two
  full-width ``[TK, TN]`` planes (``byte & 15``, ``byte >> 4``) that dot
  against the matching halves of ``x``.
* Grid is ``(M-tiles, N-tiles, K-tiles)`` with K innermost; partials
  accumulate in an f32 VMEM scratch, written once on the last K step.

The XLA path (`_matmul_xla`) is the numeric reference: dequantize fully, then
matmul. Tests assert the Pallas kernels match it on CPU via interpret mode.
"""

from __future__ import annotations

import functools
from dataclasses import replace as _dc_replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QTensor


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def _matmul_xla(x: jax.Array, qt: QTensor, dequant_dtype) -> jax.Array:
    w = qt.dequantize(dequant_dtype)  # [N, K]
    return jax.lax.dot_general(
        x.astype(dequant_dtype),
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _dequant(codes_i32, s_ref, b_ref, group_size, dequant_dtype):
    """codes [TK, TN] + scales [gpt, TN] → dequantized weights [TK, TN].

    Scale expansion via jnp.repeat along sublanes. (A 3-D
    reshape-and-broadcast variant compiles but stalls on hardware — Mosaic
    handles the flat repeat far better.)"""
    s = jnp.repeat(
        s_ref[...].astype(jnp.float32).reshape(-1, s_ref.shape[-1]),
        group_size, axis=0,
    )
    w = codes_i32.astype(jnp.float32) * s
    if b_ref is not None:
        b = jnp.repeat(
            b_ref[...].astype(jnp.float32).reshape(-1, b_ref.shape[-1]),
            group_size, axis=0,
        )
        w = w + b
    return w.astype(dequant_dtype)


_DN = (((1,), (0,)), ((), ()))  # x[TM, TK] @ w[TK, TN]

import os as _os

#: Inner dequant+dot formulation (decode is VPU-bound on the dequant at
#: small M — see exp/vpu_ablation.py / VERDICT r2 §1c). Read once at import;
#: tests flip the module attr and call jax.clear_caches().
#:   cur      — i32→f32 dequant, f32 scale mul, cast to dequant_dtype
#:   f32dot   — same dequant but feed the MXU f32 (drops the final cast)
#:   bf16mul  — codes and scales converted straight to bf16 (halves the
#:              convert/mul width; codes 0..31 are exact in bf16)
#:   groupdot — unscaled bf16 codes dot per K-group on the MXU; the f32
#:              scale lands on the [TM, TN] partial (VPU work ÷ gs/TM)
#: v5e llama-8B Q4_K bench (exp/variant_bench.log, 2026-08-19): decode
#: tok/s cur 711 / f32dot 730 / bf16mul 552 / groupdot 634 (and groupdot
#: collapses prefill MFU 0.78→0.25) → default f32dot: the MXU is idle at
#: decode M, so dropping the f32→bf16 cast of the weight tile is pure VPU
#: savings, and at prefill M the f32 dot still clears 0.77 MFU.
_MM_VARIANT = _os.environ.get("MRSTPU_MM_VARIANT", "f32dot")


def _deq_dot(x_ref, codes_i32, s_ref, b_ref, group_size, dequant_dtype):
    """One half-plane contraction ``x[TM, TK] · dequant(codes)[TK, TN]`` in
    the variant selected by ``MRSTPU_MM_VARIANT``. Bias planes riding the
    kernel (grouped/MoE banks, where the XLA `_bias_term` gather would
    materialize the selected planes under the layer scan) stay on the
    f32dot path: the scale-only dot plus the "min" term as TWO MXU dots —
    ``Σ_k x·b[g(k)] = (x @ E) @ b`` with E the group-sum expander (iota
    compare, constant-folded). r5 MoE probe: 0.637 → ~0.50 ms/call chained
    vs the "cur" fallback, with no gather traffic."""
    variant = _MM_VARIANT if b_ref is None else (
        "f32dot_bias" if _MM_VARIANT == "f32dot" else "cur"
    )
    if variant == "f32dot_bias":
        s = jnp.repeat(
            s_ref[...].astype(jnp.float32).reshape(-1, s_ref.shape[-1]),
            group_size, axis=0,
        )
        w = codes_i32.astype(jnp.float32) * s
        x32 = x_ref[...].astype(jnp.float32)
        acc = jax.lax.dot_general(
            x32, w, _DN, preferred_element_type=jnp.float32
        )
        tk = w.shape[0]
        gpt = tk // group_size
        rows = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 1)
        e = (rows // group_size == cols).astype(jnp.float32)
        xs = jax.lax.dot_general(
            x32, e, _DN, preferred_element_type=jnp.float32
        )  # [TM, gpt] group sums
        b = b_ref[...].astype(jnp.float32).reshape(-1, b_ref.shape[-1])
        return acc + jax.lax.dot_general(
            xs, b, _DN, preferred_element_type=jnp.float32
        )
    if variant == "cur":
        w = _dequant(codes_i32, s_ref, b_ref, group_size, dequant_dtype)
        return jax.lax.dot_general(
            x_ref[...], w, _DN, preferred_element_type=jnp.float32
        )
    if variant == "f32dot":
        s = jnp.repeat(
            s_ref[...].astype(jnp.float32).reshape(-1, s_ref.shape[-1]),
            group_size, axis=0,
        )
        w = codes_i32.astype(jnp.float32) * s
        return jax.lax.dot_general(
            x_ref[...].astype(jnp.float32), w, _DN,
            preferred_element_type=jnp.float32,
        )
    if variant == "bf16mul":
        s = jnp.repeat(
            s_ref[...].reshape(-1, s_ref.shape[-1]).astype(jnp.bfloat16),
            group_size, axis=0,
        )
        w = codes_i32.astype(jnp.bfloat16) * s
        return jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), w, _DN,
            preferred_element_type=jnp.float32,
        )
    if variant == "groupdot":
        wb = codes_i32.astype(jnp.bfloat16)
        x = x_ref[...].astype(jnp.bfloat16)
        s2 = s_ref[...].astype(jnp.float32).reshape(-1, s_ref.shape[-1])
        acc = None
        for g in range(wb.shape[0] // group_size):
            lo, hi = g * group_size, (g + 1) * group_size
            part = jax.lax.dot_general(
                x[:, lo:hi], wb[lo:hi], _DN,
                preferred_element_type=jnp.float32,
            )
            term = part * s2[g][None, :]
            acc = term if acc is None else acc + term
        return acc
    raise ValueError(f"unknown MRSTPU_MM_VARIANT {variant!r}")


def _w4_kernel(
    x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, b_lo_ref, b_hi_ref,
    o_ref, acc_ref, *, group_size, dequant_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...].astype(jnp.int32) & 0xFF
    acc_ref[...] += _deq_dot(
        x_lo_ref, p & 15, s_lo_ref, b_lo_ref, group_size, dequant_dtype
    ) + _deq_dot(x_hi_ref, p >> 4, s_hi_ref, b_hi_ref, group_size, dequant_dtype)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _w8_kernel(
    x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, group_size, dequant_dtype, signed,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.int32)
    if not signed:
        q = q & 0xFF
    w = _dequant(q, s_ref, b_ref, group_size, dequant_dtype)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, _DN, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


import os

# Tuned on v5e against the full llama-8B decode matmul chain (M=8):
# (TN, TK) = (1024, 2048) → 8.05 ms vs 9.58 at (512, 1024) — bigger tiles
# amortize per-grid-step semaphore/dequant overhead. At decode TM the
# working set fits scoped VMEM; larger M (prefill) shrinks tiles via the
# budget walk in `_pick_tiles` (Mosaic's scoped-VMEM stack limit is 16 MB
# and the dequantized weight tile lives on that stack too).
#: r5 tile sweep (exp/tile_sweep_r5.log): (2048, 1024) trims the ISOLATED
#: llama-8B decode chain 7.86 → 7.68 ms, but composed into the full step
#: it is ~1% SLOWER (exp/bench_r5_quick*.log) — in situ the matmul tail
#: overlaps the attention kernel's lead DMAs and the isolated win
#: evaporates. Keep (1024, 2048); the env knobs remain for tuning.
_TN_DEFAULT = int(os.environ.get("MRSTPU_MM_TN", "1024"))
_TK_DEFAULT = int(os.environ.get("MRSTPU_MM_TK", "2048"))
_VMEM_BUDGET = int(os.environ.get("MRSTPU_MM_VMEM_MB", "15")) << 20


def _tile_vmem(tm, tn, tk, group_size, planes, has_bias, out_bytes):
    """Scoped-VMEM bytes for one grid step: double-buffered in/out blocks +
    the stack-allocated dequantized weight tile(s) + the f32 accumulator.
    `planes` = 2 for the w4 split-half layout, 1 for w8. Bias-in-kernel
    calls additionally stack the group-sum expander E [tk, gpt] and the
    xs partial (the f32dot_bias path)."""
    gpt = max(tk // group_size, 1)
    x = planes * tm * tk * 2
    codes = tk * tn
    s = planes * gpt * tn * 4 * (2 if has_bias else 1)
    o = tm * tn * out_bytes
    temp = planes * tk * tn * 2
    acc = tm * tn * 4
    bias_stack = planes * (tk * gpt + tm * gpt) * 4 if has_bias else 0
    return 2 * (x + codes + s + o) + temp + acc + bias_stack


def _pick_tiles(
    m: int, n: int, k_store: int, group_size: int,
    planes: int = 2, has_bias: bool = True, out_bytes: int = 4,
    fixed_tm: bool = False,
):
    """(TM, TN, TK): TK in *stored*-K units (packed bytes for w4).

    Mosaic constraint: the scale block (gpt, TN) needs gpt = TK/gs ≥ 8 (or the
    whole G dim); TK must divide the stored K. Tiles then shrink until the
    per-step working set fits the scoped-VMEM budget — decode (small TM)
    keeps the big tuned tiles, prefill (TM=256) steps down automatically.
    ``fixed_tm``: the caller's row tile is immovable (grouped kernels tile by
    expert-group rows) — the budget walk then only shrinks TK/TN, so the
    returned tiles are validated against the TM actually used.
    """
    tm = min(_round_up(m, 16), 256)
    tn = _TN_DEFAULT if n % _TN_DEFAULT == 0 else (256 if n % 256 == 0 else 128)
    tk = _TK_DEFAULT
    while tk > group_size and k_store % tk != 0:
        tk //= 2
    if k_store % tk != 0 or (tk // group_size) < 8:
        tk = k_store  # single K step: scale block covers the full G dim
    while _tile_vmem(tm, tn, tk, group_size, planes, has_bias, out_bytes) \
            > _VMEM_BUDGET:
        if tk >= 16 * group_size and k_store % (tk // 2) == 0:
            tk //= 2  # keeps gpt = tk/gs ≥ 8
        elif tn > 256 and n % (tn // 2) == 0:
            tn //= 2
        elif tm > 16 and not fixed_tm:
            tm //= 2
        elif tn > 128 and n % (tn // 2) == 0:
            tn //= 2
        else:
            break
    return tm, tn, tk


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "dequant_dtype", "out_dtype", "interpret"),
)
def _w4_matmul(
    x, packed, scale, bias, *, group_size, dequant_dtype, out_dtype, interpret
):
    m, k = x.shape
    k2, n = packed.shape
    tm, tn, tk = _pick_tiles(m, n, k2, group_size,
                             has_bias=bias is not None)
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k2 // tk)
    gpt = tk // group_size
    khalf = k2 // tk  # K tiles per half
    g2 = scale.shape[0] // 2

    # scales viewed as [2, G/2, N]: plane 0 = low-nibble half, 1 = high half
    scale3 = scale.reshape(2, g2, n)
    bias3 = None if bias is None else bias.reshape(2, g2, n)

    x_lo_spec = pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM)
    x_hi_spec = pl.BlockSpec(
        (tm, tk), lambda i, j, kk: (i, khalf + kk), memory_space=pltpu.VMEM
    )
    p_spec = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    s_lo_spec = pl.BlockSpec(
        (1, gpt, tn), lambda i, j, kk: (0, kk, j), memory_space=pltpu.VMEM
    )
    s_hi_spec = pl.BlockSpec(
        (1, gpt, tn), lambda i, j, kk: (1, kk, j), memory_space=pltpu.VMEM
    )

    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            x_lo, x_hi, p, s_lo, s_hi, b_lo, b_hi, o, acc = refs
        else:
            x_lo, x_hi, p, s_lo, s_hi, o, acc = refs
            b_lo = b_hi = None
        _w4_kernel(
            x_lo, x_hi, p, s_lo, s_hi, b_lo, b_hi, o, acc,
            group_size=group_size, dequant_dtype=dequant_dtype,
        )

    in_specs = [x_lo_spec, x_hi_spec, p_spec, s_lo_spec, s_hi_spec]
    args = [x, x, packed, scale3, scale3]
    if has_bias:
        in_specs += [s_lo_spec, s_hi_spec]
        args += [bias3, bias3]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=n * k2 + 2 * scale.size * 4 + mp * k2 * 2 * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m] if mp != m else out


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "dequant_dtype", "out_dtype", "signed", "interpret"),
)
def _w8_matmul(
    x, codes, scale, bias, *, group_size, dequant_dtype, out_dtype, signed, interpret
):
    m, k = x.shape
    _, n = codes.shape
    tm, tn, tk = _pick_tiles(m, n, k, group_size, planes=1,
                             has_bias=bias is not None)
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k // tk)
    gpt = tk // group_size

    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref = refs
        else:
            x_ref, q_ref, s_ref, o_ref, acc_ref = refs
            b_ref = None
        _w8_kernel(
            x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref,
            group_size=group_size, dequant_dtype=dequant_dtype, signed=signed,
        )

    s_spec = pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        s_spec,
    ]
    args = [x, codes, scale]
    if has_bias:
        in_specs.append(s_spec)
        args.append(bias)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=n * k + scale.size * 4 + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m] if mp != m else out


# ---------------------------------------------------------------------------
# stacked (layer-indexed) kernels
# ---------------------------------------------------------------------------
#
# A decoder's layer loop is a `lax.scan`; if the stacked [L, ...] weight
# planes ride the scan as `xs`, XLA materializes a dynamic-slice COPY of
# every layer's weights before each pallas_call — ~3x HBM traffic on the
# decode hot path (measured: 13.9 ms vs 8.3 ms for the llama3-8b Q4_K
# matmul chain). These variants instead take the FULL stacked tensors plus
# a scalar-prefetch layer index that offsets the BlockSpec index maps, so
# tiles stream straight from the stacked HBM buffer (same trick as the
# fused paged-attention kernel's layer argument). The analog of the
# reference keeping all layers' quantized weights resident and indexing
# per layer (`mistralrs-quant/src/gguf/mod.rs`).


def _w4_matmul_l_kernel(
    l_ref, x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, b_lo_ref, b_hi_ref,
    o_ref, acc_ref, *, group_size, dequant_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0].astype(jnp.int32) & 0xFF
    acc_ref[...] += _deq_dot(
        x_lo_ref, p & 15, s_lo_ref, b_lo_ref, group_size, dequant_dtype
    ) + _deq_dot(x_hi_ref, p >> 4, s_hi_ref, b_hi_ref, group_size, dequant_dtype)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "dequant_dtype", "out_dtype", "interpret"),
)
def _w4_matmul_l(
    x, packed, scale, bias, layer,
    *, group_size, dequant_dtype, out_dtype, interpret,
):
    """w4 matmul against layer `layer` of stacked planes.

    packed [L, Kst, N] u8, scale/bias [L, G, N]; layer a traced i32 scalar.
    """
    m, k = x.shape
    nl, k2, n = packed.shape
    tm, tn, tk = _pick_tiles(m, n, k2, group_size,
                             has_bias=bias is not None)
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k2 // tk)
    gpt = tk // group_size
    khalf = k2 // tk
    g2 = scale.shape[1] // 2

    scale4 = scale.reshape(nl, 2, g2, n)
    bias4 = None if bias is None else bias.reshape(nl, 2, g2, n)
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            l, x_lo, x_hi, p, s_lo, s_hi, b_lo, b_hi, o, acc = refs
        else:
            l, x_lo, x_hi, p, s_lo, s_hi, o, acc = refs
            b_lo = b_hi = None
        _w4_matmul_l_kernel(
            l, x_lo, x_hi, p, s_lo, s_hi, b_lo, b_hi, o, acc,
            group_size=group_size, dequant_dtype=dequant_dtype,
        )

    s_lo_spec = pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, l: (l[0], 0, kk, j))
    s_hi_spec = pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, l: (l[0], 1, kk, j))
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, kk)),
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, khalf + kk)),
        pl.BlockSpec((1, tk, tn), lambda i, j, kk, l: (l[0], kk, j)),
        s_lo_spec,
        s_hi_spec,
    ]
    args = [x, x, packed, scale4, scale4]
    if has_bias:
        in_specs += [s_lo_spec, s_hi_spec]
        args += [bias4, bias4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=n * k2 + 2 * scale.size * 4 // nl
            + mp * k2 * 2 * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return out[:m] if mp != m else out


def _w8_matmul_l_kernel(
    l_ref, x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref,
    *, group_size, dequant_dtype, signed,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.int32)
    if not signed:
        q = q & 0xFF
    w = _dequant(q, s_ref, b_ref, group_size, dequant_dtype)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, _DN, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "dequant_dtype", "out_dtype", "signed", "interpret"),
)
def _w8_matmul_l(
    x, codes, scale, bias, layer,
    *, group_size, dequant_dtype, out_dtype, signed, interpret,
):
    m, k = x.shape
    nl, _, n = codes.shape
    tm, tn, tk = _pick_tiles(m, n, k, group_size, planes=1,
                             has_bias=bias is not None)
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k // tk)
    gpt = tk // group_size
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            l, x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref = refs
        else:
            l, x_ref, q_ref, s_ref, o_ref, acc_ref = refs
            b_ref = None
        _w8_matmul_l_kernel(
            l, x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref,
            group_size=group_size, dequant_dtype=dequant_dtype, signed=signed,
        )

    s_spec = pl.BlockSpec((1, gpt, tn), lambda i, j, kk, l: (l[0], kk, j))
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, kk)),
        pl.BlockSpec((1, tk, tn), lambda i, j, kk, l: (l[0], kk, j)),
        s_spec,
    ]
    args = [x, codes, scale]
    if has_bias:
        in_specs.append(s_spec)
        args.append(bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=n * k + scale.size * 4 // nl + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return out[:m] if mp != m else out


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _bias_term(x2, bias, group_size, layer=None):
    """Group-bias contribution as an MXU matmul.

    ``Σ_k x[m,k]·b[g(k),n] = Σ_g (Σ_{k∈g} x[m,k])·b[g,n]`` — so the bias
    half of dequantization (k-quant "min" planes) never touches the VPU
    dequant loop: the kernel runs scale-only (~2 fewer VPU ops per weight,
    measured 10.26 → 8.6 ms on the llama-8B decode matmul chain) and the
    bias lands as a tiny ``[M, K/gs] @ [K/gs, N]`` matmul."""
    m, k = x2.shape
    xs = x2.astype(jnp.float32).reshape(m, k // group_size, group_size).sum(-1)
    if layer is not None:
        bias = jax.lax.dynamic_index_in_dim(bias, layer, 0, keepdims=False)
    return xs @ bias.astype(jnp.float32)


def _default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def quant_matmul(
    x: jax.Array,
    qt: QTensor,
    *,
    out_dtype=None,
    dequant_dtype=jnp.bfloat16,
    backend: Optional[str] = None,
    interpret: bool = False,
    layer: Optional[jax.Array] = None,
) -> jax.Array:
    """Compute ``x @ w.T`` for quantized ``w = [N, K]``; ``x`` is ``[..., K]``.

    Accumulation is always f32 on the MXU; ``dequant_dtype`` is the precision
    weights are dequantized to in VMEM (bf16 = MXU-native).

    With ``layer`` (a traced i32 scalar), ``qt`` holds STACKED per-layer
    planes ``[L, ...]`` and the matmul runs against layer ``layer`` without
    materializing a slice (scalar-prefetch indexing in the kernel) — the
    decoder scan's hot path.
    """
    if backend is None:
        backend = _default_backend()
    if backend == "pallas" and not interpret and jax.default_backend() != "tpu":
        # explicit pallas off-TPU (the multichip dryrun's virtual CPU mesh):
        # run the real kernels in interpret mode — compiled Pallas only
        # exists for TPU
        interpret = True
    out_dtype = out_dtype or x.dtype
    *batch, k = x.shape
    if layer is not None:
        k2, n = qt.data.shape[1], qt.data.shape[2]
        if backend == "xla":
            qt2 = _dc_replace(
                qt,
                data=jax.lax.dynamic_index_in_dim(qt.data, layer, 0, False),
                scale=jax.lax.dynamic_index_in_dim(qt.scale, layer, 0, False),
                bias=(
                    None if qt.bias is None else
                    jax.lax.dynamic_index_in_dim(qt.bias, layer, 0, False)
                ),
            )
            return _matmul_xla(x, qt2, dequant_dtype).astype(out_dtype)
        x2 = x.reshape(-1, k).astype(dequant_dtype)
        bias_mxu = qt.bias is not None
        if qt.packed:
            if qt.chunks != 1:
                raise ValueError(
                    "Pallas path needs single-chunk packing: inside shard_map "
                    "use parallel.tp.local_view() on row-parallel weights"
                )
            out = _w4_matmul_l(
                x2, qt.data, qt.scale, None if bias_mxu else qt.bias, layer,
                group_size=qt.group_size, dequant_dtype=dequant_dtype,
                out_dtype=jnp.float32 if bias_mxu else out_dtype,
                interpret=interpret,
            )
        else:
            out = _w8_matmul_l(
                x2, qt.data, qt.scale, None if bias_mxu else qt.bias, layer,
                group_size=qt.group_size, dequant_dtype=dequant_dtype,
                out_dtype=jnp.float32 if bias_mxu else out_dtype,
                signed=qt.data.dtype == jnp.int8,
                interpret=interpret,
            )
        if bias_mxu:
            out = (out + _bias_term(x2, qt.bias, qt.group_size, layer)).astype(
                out_dtype
            )
        return out.reshape(*batch, n)
    n = qt.out_features
    if k != qt.in_features:
        raise ValueError(f"x K={k} != weight K={qt.in_features}")
    if backend == "xla":
        return _matmul_xla(x, qt, dequant_dtype).astype(out_dtype)

    x2 = x.reshape(-1, k).astype(dequant_dtype)
    bias_mxu = qt.bias is not None
    if qt.packed:
        if qt.chunks != 1:
            raise ValueError(
                "Pallas path needs single-chunk packing: inside shard_map use "
                "parallel.tp.local_view() on row-parallel weights"
            )
        out = _w4_matmul(
            x2, qt.data, qt.scale, None if bias_mxu else qt.bias,
            group_size=qt.group_size, dequant_dtype=dequant_dtype,
            out_dtype=jnp.float32 if bias_mxu else out_dtype,
            interpret=interpret,
        )
    else:
        signed = qt.data.dtype == jnp.int8
        out = _w8_matmul(
            x2, qt.data, qt.scale, None if bias_mxu else qt.bias,
            group_size=qt.group_size, dequant_dtype=dequant_dtype,
            out_dtype=jnp.float32 if bias_mxu else out_dtype,
            signed=signed, interpret=interpret,
        )
    if bias_mxu:
        out = (out + _bias_term(x2, qt.bias, qt.group_size)).astype(out_dtype)
    return out.reshape(*batch, n)


# ---------------------------------------------------------------------------
# grouped (ragged) kernels — MoE expert banks
# ---------------------------------------------------------------------------
#
# The megablox formulation (TPU analog of the reference's grouped MoE GEMM,
# `mistralrs-quant/kernels/moe_grouped/`): tokens arrive SORTED by expert and
# padded so every TM-row tile belongs to exactly one expert; a scalar-prefetch
# vector `tile_idx[i]` names that expert (or `layer*E + expert` for stacked
# per-layer banks) and offsets the weight BlockSpecs, so each tile streams its
# own expert's quantized planes straight from the stacked HBM buffer. The
# kernel bodies are the SAME as the layer-indexed variants; only the index
# maps differ. k-quant "min" planes ride into the kernel here (per-tile
# experts defeat the groupsum-matmul trick, which needs one bias per call).


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "dequant_dtype", "out_dtype", "tm", "interpret"),
)
def _w4_matmul_g(
    x, packed, scale, bias, tile_idx,
    *, group_size, dequant_dtype, out_dtype, tm, interpret,
):
    """w4 grouped matmul: row-tile i of ``x`` (``[T*tm, K]``, sorted+padded)
    multiplies bank entry ``tile_idx[i]`` of ``packed [NB, Kst, N]``."""
    mp, k = x.shape
    nb, k2, n = packed.shape
    t = mp // tm
    _, tn, tk = _pick_tiles(tm, n, k2, group_size,
                            has_bias=bias is not None, fixed_tm=True)
    grid = (t, _cdiv(n, tn), k2 // tk)
    gpt = tk // group_size
    khalf = k2 // tk
    g2 = scale.shape[1] // 2

    scale4 = scale.reshape(nb, 2, g2, n)
    bias4 = None if bias is None else bias.reshape(nb, 2, g2, n)
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            g, x_lo, x_hi, p, s_lo, s_hi, b_lo, b_hi, o, acc = refs
        else:
            g, x_lo, x_hi, p, s_lo, s_hi, o, acc = refs
            b_lo = b_hi = None
        _w4_matmul_l_kernel(
            g, x_lo, x_hi, p, s_lo, s_hi, b_lo, b_hi, o, acc,
            group_size=group_size, dequant_dtype=dequant_dtype,
        )

    s_lo_spec = pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, g: (g[i], 0, kk, j))
    s_hi_spec = pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, g: (g[i], 1, kk, j))
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk, g: (i, kk)),
        pl.BlockSpec((tm, tk), lambda i, j, kk, g: (i, khalf + kk)),
        pl.BlockSpec((1, tk, tn), lambda i, j, kk, g: (g[i], kk, j)),
        s_lo_spec,
        s_hi_spec,
    ]
    args = [x, x, packed, scale4, scale4]
    if has_bias:
        in_specs += [s_lo_spec, s_hi_spec]
        args += [bias4, bias4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, g: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=t * (tn * _cdiv(n, tn)) * k2
            + mp * k2 * 2 * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tile_idx, jnp.int32), *args)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "dequant_dtype", "out_dtype", "signed", "tm", "interpret"
    ),
)
def _w8_matmul_g(
    x, codes, scale, bias, tile_idx,
    *, group_size, dequant_dtype, out_dtype, signed, tm, interpret,
):
    mp, k = x.shape
    nb, _, n = codes.shape
    t = mp // tm
    _, tn, tk = _pick_tiles(tm, n, k, group_size, planes=1,
                            has_bias=bias is not None, fixed_tm=True)
    grid = (t, _cdiv(n, tn), k // tk)
    gpt = tk // group_size
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            g, x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref = refs
        else:
            g, x_ref, q_ref, s_ref, o_ref, acc_ref = refs
            b_ref = None
        _w8_matmul_l_kernel(
            g, x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref,
            group_size=group_size, dequant_dtype=dequant_dtype, signed=signed,
        )

    s_spec = pl.BlockSpec((1, gpt, tn), lambda i, j, kk, g: (g[i], kk, j))
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk, g: (i, kk)),
        pl.BlockSpec((1, tk, tn), lambda i, j, kk, g: (g[i], kk, j)),
        s_spec,
    ]
    args = [x, codes, scale]
    if has_bias:
        in_specs.append(s_spec)
        args.append(bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, g: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=t * n * k + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tile_idx, jnp.int32), *args)


def quant_matmul_grouped(
    x: jax.Array,
    qt: QTensor,
    tile_idx: jax.Array,
    *,
    tm: int,
    out_dtype=None,
    dequant_dtype=jnp.bfloat16,
    backend: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Grouped ``x @ w[tile_idx[i]].T`` over a stacked bank ``qt [NB, N, K]``.

    ``x`` is ``[T*tm, K]`` (tokens sorted by bank entry, groups padded to a
    ``tm`` multiple); ``tile_idx`` is ``[T]`` i32 — the bank entry every
    row-tile multiplies. The XLA path materializes per-tile weights (numeric
    reference; fine on CPU, not for production)."""
    if backend is None:
        backend = _default_backend()
    out_dtype = out_dtype or x.dtype
    mp, k = x.shape
    n = qt.data.shape[-1] if not qt.packed else qt.data.shape[-1]
    if backend == "xla":
        w = qt.dequantize(dequant_dtype)  # [NB, N, K]
        wt = w[tile_idx]  # [T, N, K]
        xt = x.reshape(-1, tm, k)
        out = jnp.einsum(
            "tmk,tnk->tmn", xt.astype(dequant_dtype), wt,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(mp, -1).astype(out_dtype)
    x2 = x.astype(dequant_dtype)
    # bias planes ride the kernel and take the in-kernel f32dot_bias path
    # (`_deq_dot`): scale-only dequant + the "min" term as two MXU dots.
    # (An XLA-side gathered-bias einsum measured faster in isolation but
    # MATERIALIZES bias[tile_idx] under forward_paged's layer scan — the
    # full mixtral decode regressed 487 → 249 tok/s; exp/bench_r5_full.log.)
    if qt.packed:
        if qt.chunks != 1:
            raise ValueError("grouped Pallas path needs single-chunk packing")
        return _w4_matmul_g(
            x2, qt.data, qt.scale, qt.bias, tile_idx,
            group_size=qt.group_size, dequant_dtype=dequant_dtype,
            out_dtype=out_dtype, tm=tm, interpret=interpret,
        )
    return _w8_matmul_g(
        x2, qt.data, qt.scale, qt.bias, tile_idx,
        group_size=qt.group_size, dequant_dtype=dequant_dtype,
        out_dtype=out_dtype, signed=qt.data.dtype == jnp.int8,
        tm=tm, interpret=interpret,
    )
