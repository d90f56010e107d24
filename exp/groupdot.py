"""Micro: w4 matmul kernel variants at decode shapes (M=8).

  cur      — current: dequant (repeat+mul) in VPU, one big dot per k-tile
  groupdot — per-group K=32 dots on the MXU, scale applied to the [M, TN]
             partial (VPU ops ÷ group_size)
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = open("/root/repo/exp/groupdot.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


N = K = 4096
M = 8
GS = 32
L = 32  # simulate a 32-layer chain for slope timing
TN, TK = 512, 1024
_DN = (((1,), (0,)), ((), ()))


def kernel_cur(x_lo, x_hi, p_ref, s_lo, s_hi, o_ref, acc, *, gs):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    p = p_ref[...].astype(jnp.int32) & 0xFF
    for half, (xr, sr) in enumerate(((x_lo, s_lo), (x_hi, s_hi))):
        codes = (p & 15) if half == 0 else (p >> 4)
        s = jnp.repeat(sr[...].reshape(-1, sr.shape[-1]), gs, axis=0)
        w = (codes.astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc[...] += jax.lax.dot_general(
            xr[...], w, _DN, preferred_element_type=jnp.float32
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def kernel_group(x_lo, x_hi, p_ref, s_lo, s_hi, o_ref, acc, *, gs):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    p = p_ref[...].astype(jnp.int32) & 0xFF
    tk = p.shape[0]
    for half, (xr, sr) in enumerate(((x_lo, s_lo), (x_hi, s_hi))):
        codes = (p & 15) if half == 0 else (p >> 4)
        codes = codes.astype(jnp.bfloat16)
        x = xr[...]
        for g in range(tk // gs):
            part = jax.lax.dot_general(
                x[:, g * gs : (g + 1) * gs],
                codes[g * gs : (g + 1) * gs],
                _DN, preferred_element_type=jnp.float32,
            )  # [M, TN]
            acc[...] += part * sr[g][None, :]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def build(kern):
    grid = (1, N // TN, (K // 2) // TK)
    gpt = TK // GS
    khalf = (K // 2) // TK
    g2 = K // GS // 2

    def wrap(x, packed, scale3):
        return pl.pallas_call(
            functools.partial(kern, gs=GS),
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, TK), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((M, TK), lambda i, j, kk: (i, khalf + kk)),
                pl.BlockSpec((TK, TN), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((1, gpt, TN), lambda i, j, kk: (0, kk, j)),
                pl.BlockSpec((1, gpt, TN), lambda i, j, kk: (1, kk, j)),
            ],
            out_specs=pl.BlockSpec((M, TN), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x, x, packed, scale3[:1], scale3[1:])

    return wrap


def main():
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (K // 2, N), 0, 256, jnp.uint8)
    scale3 = jax.random.uniform(key, (2, K // GS // 2, N), jnp.float32, 0.001, 0.01)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)

    for name, kern in (("cur", kernel_cur), ("groupdot", kernel_group)):
        f = build(kern)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x, packed, scale3, n):
            def body(h, _):
                y = f(h, packed, scale3)
                return y[:, :K].astype(jnp.bfloat16) * 0 + x, None

            h, _ = jax.lax.scan(body, x, None, length=n)
            return h

        def run(n):
            c = jax.jit(functools.partial(chain, n=n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(c(x, packed, scale3))
                best = min(best, time.perf_counter() - t0)
            return best

        run(4), run(16)
        t1, t2 = run(4), run(16)
        per = (t2 - t1) / 12
        gbs = (K // 2 * N + K // GS * N * 4) / per / 1e9
        emit(what=name, per_call_us=round(per * 1e6, 1), gbs=round(gbs, 1))


main()
