"""Round-5 scale/bias-plane byte-reduction ablation on the llama3-8b
stacked decode chain (VERDICT r5 item 2: break the 0.78 decode plateau).

The decode matmul chain runs 7.82 ms against a 6.39 ms f32-plane floor;
planes (scale+bias, f32 [L,G,N]) are 1/3 of the bytes. r4's bf16-plane
attempt regressed to 12.35 ms — packed-dtype (16,128)-tiled blocks +
relayout converts are slow in Mosaic. Variants here:

  A  f32 planes, bias on MXU (_bias_term)          [current default]
  Bb f32 scale in-kernel, *bf16 bias* on the MXU    (bias plane halved,
     zero kernel change: the MXU eats bf16 natively)
  B  bf16 scale in-kernel + bf16 bias               (r4 repro)
  P  *u32 packed-pair* scale plane in-kernel + bf16 bias: two adjacent
     groups' bf16 bits in one u32 → native i32 layout, unpack with
     shift+bitcast at [gpt/2, TN] scale, interleave, then the usual
     repeat. Scale bytes halved with no packed-dtype blocks.

Floors: f32 6.39 / bias-bf16 5.86 / both-halved 5.33 ms.
"""
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import signal

from bench import llama8b_cfg, build_weights

signal.alarm(0)
from mistralrs_tpu.quant.qtensor import QTensor
import importlib

qmm = importlib.import_module("mistralrs_tpu.ops.quant_matmul")

OUT = open("/root/repo/exp/plane_r5.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


TN, TK = 1024, 2048
GS = 32


# ---- packed-pair kernel (variant P) -----------------------------------------


def _pair_unpack(s_ref, gs):
    """[1,1,gpt/2,TN] i32 packed-pair → [TK,TN] f32 expanded scales.

    u32 = (bf16_bits(s[2g]) << 16) | bf16_bits(s[2g+1]); bf16→f32 is a
    pure bit-pad so f32 = bitcast(bits << 16) is exact."""
    v = s_ref[0, 0]  # [gpt2, tn] i32
    even = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(v, jnp.int32(-65536)), jnp.float32
    )
    odd = jax.lax.bitcast_convert_type(v << 16, jnp.float32)
    gpt2, tn = even.shape
    # interleave rows (2g, 2g+1), then group-repeat
    s_small = jnp.stack([even, odd], axis=1).reshape(gpt2 * 2, tn)
    return jnp.repeat(s_small, gs, axis=0)


def _w4pair_l_kernel(
    l_ref, x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
    *, group_size,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0].astype(jnp.int32) & 0xFF
    dn = (((1,), (0,)), ((), ()))

    def half(x_ref, codes, s_ref):
        s = _pair_unpack(s_ref, group_size)
        w = codes.astype(jnp.float32) * s
        return jax.lax.dot_general(
            x_ref[...].astype(jnp.float32), w, dn,
            preferred_element_type=jnp.float32,
        )

    acc_ref[...] += half(x_lo_ref, p & 15, s_lo_ref)
    acc_ref[...] += half(x_hi_ref, p >> 4, s_hi_ref)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4pair_matmul_l(x, packed, spacked, layer, *, group_size):
    """packed [L,Kst,N] u8; spacked [L,G/2,N] i32 (pair-packed bf16 bits)."""
    m, k = x.shape
    nl, k2, n = packed.shape
    tm = min(_round_up(m, 16), 256)
    tn, tk = TN, TK
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k2 // tk)
    gpt = tk // group_size
    khalf = k2 // tk
    g4 = spacked.shape[1] // 2  # per-half packed rows

    sp4 = spacked.reshape(nl, 2, g4, n)

    def s_spec(which):
        return pl.BlockSpec(
            (1, 1, gpt // 2, tn), lambda i, j, kk, l, w=which: (l[0], w, kk, j)
        )

    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, kk)),
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, khalf + kk)),
        pl.BlockSpec((1, tk, tn), lambda i, j, kk, l: (l[0], kk, j)),
        s_spec(0),
        s_spec(1),
    ]
    args = [x, x, packed, sp4, sp4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_w4pair_l_kernel, group_size=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=n * k2 + spacked.size * 4 // nl
            + mp * k2 * 2 * 2 + mp * n * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return out[:m] if mp != m else out


def pack_pairs(scale):
    """[L,G,N] f32 → [L,G/2,N] i32 with (2g,2g+1) bf16 bits packed.

    Must pack within each nibble half-plane separately (the kernel views
    planes as [L,2,G/2,N]): reshape first."""
    nl, g, n = scale.shape
    s2 = scale.reshape(nl, 2, g // 2, n)  # halves
    bits = jax.lax.bitcast_convert_type(
        s2.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32
    )  # bf16 round then zero-padded low bits
    even = bits[:, :, 0::2, :]
    odd = bits[:, :, 1::2, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(even, jnp.int32(-65536)),
                            jax.lax.shift_right_logical(odd, 16))
    return packed.reshape(nl, g // 2, n)


# ---- data -------------------------------------------------------------------

cfg = llama8b_cfg()
B = 8
weights, _ = build_weights(cfg)
from mistralrs_tpu.models.llama import fuse_projections

weights = fuse_projections(weights, cfg)
layers = weights["layers"]
L = cfg.num_layers
names = ["wqkv", "wo", "wgateup", "down"]


def cast_planes(qt, dtype):
    import dataclasses
    return dataclasses.replace(
        qt, scale=qt.scale.astype(dtype),
        bias=None if qt.bias is None else qt.bias.astype(dtype),
    )


f32_layers = {nm: layers[nm] for nm in names}
bf16_layers = {nm: cast_planes(layers[nm], jnp.bfloat16) for nm in names}


def bias_bf16(qt):
    import dataclasses
    return dataclasses.replace(
        qt, bias=None if qt.bias is None else qt.bias.astype(jnp.bfloat16)
    )


bb_layers = {nm: bias_bf16(layers[nm]) for nm in names}
pair_layers = {
    nm: (layers[nm].data, pack_pairs(layers[nm].scale),
         None if layers[nm].bias is None
         else layers[nm].bias.astype(jnp.bfloat16))
    for nm in names
}

wbytes_f32 = sum(
    layers[nm].data.size + layers[nm].scale.size * 4
    + (0 if layers[nm].bias is None else layers[nm].bias.size * 4)
    for nm in names
)
wbytes_bb = sum(
    layers[nm].data.size + layers[nm].scale.size * 4
    + (0 if layers[nm].bias is None else layers[nm].bias.size * 2)
    for nm in names
)
wbytes_pair = sum(
    layers[nm].data.size + layers[nm].scale.size * 2
    + (0 if layers[nm].bias is None else layers[nm].bias.size * 2)
    for nm in names
)
emit(what="bytes_gb", f32=round(wbytes_f32 / 1e9, 3),
     bias_bf16=round(wbytes_bb / 1e9, 3),
     pair=round(wbytes_pair / 1e9, 3),
     floor_f32=round(wbytes_f32 / 819e9 * 1e3, 3),
     floor_bb=round(wbytes_bb / 819e9 * 1e3, 3),
     floor_pair=round(wbytes_pair / 819e9 * 1e3, 3))


# ---- correctness: pair kernel vs XLA reference ------------------------------

x_test = jnp.asarray(
    np.random.default_rng(0).standard_normal((8, cfg.hidden_size)) * 0.1,
    jnp.bfloat16,
)
qt = layers["wqkv"]
ref_out = qmm.quant_matmul(x_test, qt, layer=jnp.int32(3), backend="xla")
data, sp, bb = pair_layers["wqkv"]
got = w4pair_matmul_l(x_test, data, sp, jnp.int32(3), group_size=qt.group_size)
if bb is not None:
    got = got + qmm._bias_term(x_test, layers["wqkv"].bias.astype(jnp.bfloat16),
                               qt.group_size, layer=jnp.int32(3))
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref_out.astype(jnp.float32))))
rel = err / float(jnp.max(jnp.abs(ref_out.astype(jnp.float32))) + 1e-9)
emit(what="P_correctness", max_abs=round(err, 6), max_rel=round(rel, 6))


# ---- chains -----------------------------------------------------------------


# weights ride as jit ARGUMENTS — closed-over multi-GB constants get
# serialized into the HLO and break/slow the compile relay
@functools.partial(jax.jit, static_argnums=(0,))
def chain_qmm(n_steps, lyrs):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def step(x, _):
        def layer(h, li):
            qkv = qmm.quant_matmul(h, lyrs["wqkv"], layer=li)
            q = qkv[..., : cfg.q_dim]
            ao = qmm.quant_matmul(q, lyrs["wo"], layer=li)
            gu = qmm.quant_matmul(ao, lyrs["wgateup"], layer=li)
            half = gu.shape[-1] // 2
            hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
            return qmm.quant_matmul(hid, lyrs["down"], layer=li), None

        y, _ = jax.lax.scan(layer, x.astype(jnp.bfloat16), jnp.arange(L, dtype=jnp.int32))
        return (0.999 * y).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


@functools.partial(jax.jit, static_argnums=(0,))
def chain_pair(n_steps, plyrs):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def mm(h, nm, li):
        data, sp, bb = plyrs[nm]
        o = w4pair_matmul_l(h, data, sp, li, group_size=GS)
        if bb is not None:
            o = o + qmm._bias_term(h, bb, GS, layer=li)
        return o.astype(jnp.bfloat16)

    def step(x, _):
        def layer(h, li):
            qkv = mm(h, "wqkv", li)
            q = qkv[..., : cfg.q_dim]
            ao = mm(q, "wo", li)
            gu = mm(ao, "wgateup", li)
            half = gu.shape[-1] // 2
            hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
            return mm(hid, "down", li), None

        y, _ = jax.lax.scan(layer, x.astype(jnp.bfloat16), jnp.arange(L, dtype=jnp.int32))
        return (0.999 * y).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


def slope_time(fn, n1=5, n2=25, reps=3):
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(n))
            best = min(best, time.perf_counter() - t0)
        return best

    run(n1)
    run(n2)
    return (run(n2) - run(n1)) / (n2 - n1) * 1e3


f32_layers = jax.device_put(f32_layers)
bb_layers = jax.device_put(bb_layers)
bf16_layers = jax.device_put(bf16_layers)
pair_layers = jax.device_put(pair_layers)

which = sys.argv[1:] or ["A", "Bb", "P"]
if "A" in which:
    emit(what="A_f32_chain_ms",
         value=round(slope_time(lambda n: chain_qmm(n, f32_layers)), 3))
if "Bb" in which:
    emit(what="Bb_biasbf16_chain_ms",
         value=round(slope_time(lambda n: chain_qmm(n, bb_layers)), 3))
if "B" in which:
    emit(what="B_bf16_chain_ms",
         value=round(slope_time(lambda n: chain_qmm(n, bf16_layers)), 3))
if "P" in which:
    emit(what="P_pair_chain_ms",
         value=round(slope_time(lambda n: chain_pair(n, pair_layers)), 3))
emit(what="done")
