"""A/B: layer-scan weights as scan xs (dynamic-slice copies) vs stacked
weights + scalar-prefetch layer index in the kernel BlockSpec.

Hypothesis: xs slicing materializes each layer's quantized weights
(~182 MB) before every pallas_call -> ~3x HBM traffic -> the 17 ms
layer-matmul chain. A layer-indexed kernel should run near 7.1 ms
(5.83 GB / 819 GB/s).

Chain: per layer y1=mm(h,wqkv), y2=mm(y1[:, :H],wo), y3=mm(h,gateup),
y4=mm(y3[:, :I],down), h'=h+y2+y4 (forces sequencing).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

OUT = open("/root/repo/exp/stack_mm.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


L, H, I = 32, 4096, 14336
M = 8
GS = 32
TN, TK = 512, 1024

SHAPES = {  # name: (K, N)
    "wqkv": (H, 6144),
    "wo": (H, H),
    "gateup": (H, 2 * I),
    "down": (I, H),
}


def make_stacked(key):
    ws = {}
    for name, (k, n) in SHAPES.items():
        k1, k2k, k3 = jax.random.split(key, 3)
        key = k3
        ws[name] = {
            "p": jax.random.randint(k1, (L, k // 2, n), 0, 256, jnp.uint8),
            "s": jax.random.uniform(k2k, (L, 2, k // GS // 2, n), jnp.float32,
                                    0.001, 0.01),
        }
    return ws


# ---- stacked kernel: scalar-prefetch layer index ---------------------------


def _w4l_kernel(l_ref, x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, o_ref,
                acc_ref, *, group_size):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0].astype(jnp.int32) & 0xFF
    tn = p.shape[-1]

    def deq(codes, s_ref):
        s = jnp.repeat(s_ref[...].reshape(-1, tn), group_size, axis=0)
        return (codes.astype(jnp.float32) * s).astype(jnp.bfloat16)

    w_lo = deq(p & 15, s_lo_ref)
    w_hi = deq(p >> 4, s_hi_ref)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        x_lo_ref[...], w_lo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        x_hi_ref[...], w_hi, dn, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def w4_stacked(x, packed, scale, layer):
    """x [M,K] bf16, packed [L,k2,N] u8, scale [L,2,g2,N] f32, layer scalar."""
    m, k = x.shape
    _, k2, n = packed.shape
    tm = 16
    mp = tm
    x = jnp.pad(x, ((0, mp - m), (0, 0)))
    tk = TK
    while tk > GS and k2 % tk:
        tk //= 2
    tn = TN if n % TN == 0 else 256
    grid = (mp // tm, n // tn, k2 // tk)
    gpt = tk // GS
    khalf = k2 // tk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, kk)),
            pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, khalf + kk)),
            pl.BlockSpec((1, tk, tn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, l: (l[0], 0, kk, j)),
            pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, l: (l[0], 1, kk, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_w4l_kernel, group_size=GS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=n * k2 + scale.size * 4 // L + mp * k2 * 4 + mp * n * 2,
            transcendentals=0,
        ),
    )(jnp.asarray([layer], jnp.int32).reshape(1), x, x, packed, scale, scale)
    return out[:m]


# ---- per-layer kernel on pre-sliced weights (the xs variant) ---------------

from mistralrs_tpu.ops.quant_matmul import _w4_matmul


def mm_sliced(x, p, s):
    n = p.shape[-1]
    return _w4_matmul(
        x, p, s.reshape(-1, n), None, group_size=GS,
        dequant_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16, interpret=False,
    )


# ---- chains ----------------------------------------------------------------


def layer_xs(h, lw, mm):
    y1 = mm("wqkv", h, lw)
    y2 = mm("wo", y1[:, :H], lw)
    y3 = mm("gateup", h, lw)
    y4 = mm("down", y3[:, :I], lw)
    return (h + y2 + y4).astype(jnp.bfloat16)


def make_chain_xs(ws, n_steps):
    @jax.jit
    def chain(ws, h0):
        def body(h, lw):
            def mm(name, x, lw):
                return mm_sliced(x, lw[name]["p"], lw[name]["s"])

            return layer_xs(h, lw, mm), None

        def outer(h, _):
            h, _ = jax.lax.scan(body, h, ws)
            return h, None

        h, _ = jax.lax.scan(outer, h0, None, length=n_steps)
        return h

    return chain


def make_chain_stacked(ws, n_steps):
    @jax.jit
    def chain(ws, h0):
        def body(h, l):
            def mm(name, x, _lw):
                return w4_stacked(x, ws[name]["p"], ws[name]["s"], l)

            return layer_xs(h, None, mm), None

        def outer(h, _):
            h, _ = jax.lax.scan(body, h, jnp.arange(L, dtype=jnp.int32))
            return h, None

        h, _ = jax.lax.scan(outer, h0, None, length=n_steps)
        return h

    return chain


def slope(fn_builder, ws, h0, n1=3, n2=9):
    outs = {}
    for n in (n1, n2):
        f = fn_builder(ws, n)
        t_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(ws, h0))
            t_best = min(t_best, time.perf_counter() - t0)
        outs[n] = t_best
    return (outs[n2] - outs[n1]) / (n2 - n1)


def main():
    key = jax.random.PRNGKey(0)
    ws = make_stacked(key)
    h0 = jax.random.normal(key, (M, H), jnp.bfloat16)

    # correctness: stacked vs sliced on layer 3
    y_ref = mm_sliced(h0, ws["wo"]["p"][3], ws["wo"]["s"][3])
    y_new = w4_stacked(h0, ws["wo"]["p"], ws["wo"]["s"], 3)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32) -
                                y_new.astype(jnp.float32))) /
                (jnp.max(jnp.abs(y_ref.astype(jnp.float32))) + 1e-9))
    emit(what="stacked_rel_err", value=round(err, 6))

    wbytes = sum(w["p"].size + w["s"].size * 4 for w in ws.values())
    emit(what="weight_bytes", value=wbytes,
         roofline_ms=round(wbytes / 819e9 * 1e3, 2))

    t = slope(make_chain_stacked, ws, h0)
    emit(what="stacked_chain_ms", value=round(t * 1e3, 3))
    t = slope(make_chain_xs, ws, h0)
    emit(what="xs_chain_ms", value=round(t * 1e3, 3))
    emit(what="done")


if __name__ == "__main__":
    main()
