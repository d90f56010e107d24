"""Localize the grouped-kernel inefficiency (ablation: 2.59 ms vs 1.29 ms
stream floor, eff 0.50 — routing/combine are free).

Probes, each timed separately on the cached mixtral bank:
  per-call      gate / up / down individually (which matmul is off?)
  tm sweep      row tiles 16 / 32 / 64 (per-step MXU/VPU balance)
  dense-ceiling the same bytes as ONE dense stacked matmul (layer-indexed
                kernel over an [8, K, N]-shaped bank) — the streaming
                ceiling of the existing dense kernel at this shape
  fused-bank    gate+up as one [NB, K, 2N] bank (half the calls)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
import signal

signal.alarm(0)
from mistralrs_tpu.ops.moe_grouped import build_groups
from mistralrs_tpu.ops.quant_matmul import (
    _w4_matmul_l,
    quant_matmul_grouped,
)
from mistralrs_tpu.quant.qtensor import QTensor

sys.argv = [sys.argv[0]]
exec(open(os.path.join(os.path.dirname(__file__),
                       "moe_ablation_r5.py")).read().split("# A. full path")[0])
# ^ reuses load_bank() + x/topi/topw setup + timeit from the ablation file

bank1 = jax.device_put(bank1)


def qbytes(v):
    return v.data.nbytes + v.scale.nbytes + (
        v.bias.nbytes if v.bias is not None else 0)


def emit(**kw):
    print(json.dumps(kw), flush=True)


tm = 16
st, dest, sw, tile_idx, mp = jax.jit(
    lambda: build_groups(topi, topw, cfg.num_experts, tm))()
st, dest, sw, tile_idx = map(jax.device_put, (st, dest, sw, tile_idx))
xs0 = jnp.zeros((int(mp), h), x.dtype).at[dest].set(x[st])
xs0 = jax.device_put(xs0)

# --- per-call timing ---------------------------------------------------------
for nm in ("gate", "up", "down"):
    qt = bank1[nm]
    kin = qt.shape[-1]
    xin = jax.device_put(jnp.zeros((int(mp), kin), jnp.bfloat16))

    def call(qt=qt, xin=xin):
        return quant_matmul_grouped(xin, qt, tile_idx, tm=tm,
                                    out_dtype=jnp.bfloat16)

    jcall = jax.jit(lambda q, xi: quant_matmul_grouped(
        xi, q, tile_idx, tm=tm, out_dtype=jnp.bfloat16))
    t_ms = timeit(lambda: jcall(qt, xin))
    fl = qbytes(qt) / B.V5E_HBM_GBPS * 1e3
    emit(probe="per-call", mat=nm, ms=round(t_ms, 3),
         floor=round(fl, 3), eff=round(fl / t_ms, 3))

# --- tm sweep ----------------------------------------------------------------
for tm2 in (32, 64, 128):
    st2, dest2, sw2, ti2, mp2 = jax.jit(
        lambda t=tm2: build_groups(topi, topw, cfg.num_experts, t))()
    ti2 = jax.device_put(ti2)
    qt = bank1["gate"]
    xin = jax.device_put(jnp.zeros((int(mp2), qt.shape[-1]), jnp.bfloat16))
    jcall = jax.jit(lambda q, xi, t=tm2: quant_matmul_grouped(
        xi, q, ti2, tm=t, out_dtype=jnp.bfloat16))
    t_ms = timeit(lambda: jcall(qt, xin))
    fl = qbytes(qt) / B.V5E_HBM_GBPS * 1e3
    emit(probe="tm-sweep", tm=tm2, mat="gate", ms=round(t_ms, 3),
         floor=round(fl, 3), eff=round(fl / t_ms, 3))

# --- dense ceiling: the same bank streamed by the LAYER-stacked dense kernel
# (every "layer" = one expert; x [16, K] like the decode rows) ---------------
qt = bank1["gate"]
xin = jax.device_put(jnp.zeros((16, qt.shape[-1]), jnp.bfloat16))


def dense_chain(q, xi):
    def body(carry, li):
        o = _w4_matmul_l(
            xi, q.data, q.scale, None, li,
            group_size=q.group_size, dequant_dtype=jnp.float32,
            out_dtype=jnp.bfloat16, interpret=False,
        )
        return carry + o.sum(), None

    s, _ = jax.lax.scan(body, jnp.float32(0),
                        jnp.arange(cfg.num_experts, dtype=jnp.int32))
    return s


jd = jax.jit(dense_chain)
t_ms = timeit(lambda: jd(qt, xin))
fl = qbytes(qt) / B.V5E_HBM_GBPS * 1e3
emit(probe="dense-ceiling", mat="gate(all experts via layer kernel)",
     ms=round(t_ms, 3), floor=round(fl, 3), eff=round(fl / t_ms, 3))

# --- fused gate+up bank ------------------------------------------------------
import dataclasses

gu = dataclasses.replace(
    bank1["gate"],
    data=jnp.concatenate([bank1["gate"].data, bank1["up"].data], axis=-1),
    scale=jnp.concatenate([bank1["gate"].scale, bank1["up"].scale], axis=-1),
    bias=None if bank1["gate"].bias is None else jnp.concatenate(
        [bank1["gate"].bias, bank1["up"].bias], axis=-1),
)
xin = jax.device_put(jnp.zeros((int(mp), gu.shape[-1]), jnp.bfloat16))
jf = jax.jit(lambda q, xi: quant_matmul_grouped(
    xi, q, tile_idx, tm=tm, out_dtype=jnp.bfloat16))
t_ms = timeit(lambda: jf(gu, xin))
fl = qbytes(gu) / B.V5E_HBM_GBPS * 1e3
emit(probe="fused-gateup", ms=round(t_ms, 3), floor=round(fl, 3),
     eff=round(fl / t_ms, 3))
