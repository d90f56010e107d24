"""Grouped kernel with bias planes riding the kernel (current, forces the
'cur' dequant variant) vs scale-only (f32dot) + bias via a gathered MXU
term — the dense path's bias_mxu split, missing from the grouped path."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import bench as B
import signal
signal.alarm(0)
from mistralrs_tpu.ops.moe_grouped import build_groups
import importlib
qmm = importlib.import_module('mistralrs_tpu.ops.quant_matmul')

sys.argv = [sys.argv[0]]
exec(open(os.path.join(os.path.dirname(__file__),
                       "moe_ablation_r5.py")).read().split("# A. full path")[0])
bank1 = jax.device_put(bank1)
import dataclasses

def qbytes(v):
    return v.data.nbytes + v.scale.nbytes + (
        v.bias.nbytes if v.bias is not None else 0)

tm = 16
st, dest, sw, tile_idx, mp = jax.jit(
    lambda: build_groups(topi, topw, cfg.num_experts, tm))()
tile_idx = jax.device_put(tile_idx)
qt = bank1["gate"]
qt_nobias = dataclasses.replace(qt, bias=None)
xin = jax.device_put(jnp.ones((int(mp), qt.shape[-1]), jnp.bfloat16) * 0.01)

def bias_term_grouped(x2, bias, tile_idx, tm, gs):
    mp_, k = x2.shape
    xs = x2.astype(jnp.float32).reshape(mp_, k // gs, gs).sum(-1)  # [mp, G]
    xs_t = xs.reshape(-1, tm, xs.shape[-1])  # [T, tm, G]
    bt = bias[tile_idx].astype(jnp.float32)  # [T, G, N]
    return jnp.einsum("tmg,tgn->tmn", xs_t, bt).reshape(mp_, -1)

def make_chain(fn, n):
    @jax.jit
    def chain(q, xi):
        def body(x2, _):
            o = fn(x2, q)
            return (x2 * 0.999 + o[:, : x2.shape[1]] * 1e-6).astype(jnp.bfloat16), None
        x2, _ = jax.lax.scan(body, xi, None, length=n)
        return x2
    return chain

def t_of(f, q):
    jax.block_until_ready(f(q, xin)); jax.block_until_ready(f(q, xin))
    t0 = time.perf_counter()
    for _ in range(6):
        o = f(q, xin)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / 6

fl = qbytes(qt) / B.V5E_HBM_GBPS * 1e3

def run(tag, fn, q):
    c25, c5 = make_chain(fn, 25), make_chain(fn, 5)
    t25, t5 = t_of(c25, q), t_of(c5, q)
    per = (t25 - t5) / 20 * 1e3
    print(json.dumps({"variant": tag, "per_call_ms": round(per, 3),
                      "eff": round(fl / per, 3),
                      "t25_ms": round(t25 * 1e3, 2),
                      "t5_ms": round(t5 * 1e3, 2)}), flush=True)

run("bias-in-kernel(f32dot_bias)",
    lambda x2, q: qmm.quant_matmul_grouped(x2, q, tile_idx, tm=tm,
                                           out_dtype=jnp.bfloat16), qt)
run("scale-only(f32dot)",
    lambda x2, q: qmm.quant_matmul_grouped(x2, q, tile_idx, tm=tm,
                                           out_dtype=jnp.bfloat16), qt_nobias)

bias_arr = jax.device_put(qt.bias)
run("scale-only+mxu-bias",
    lambda x2, q: (qmm.quant_matmul_grouped(x2, q, tile_idx, tm=tm,
                                            out_dtype=jnp.float32)
                   + bias_term_grouped(x2, bias_arr, tile_idx, tm,
                                       q.group_size)).astype(jnp.bfloat16),
    qt_nobias)

# correctness: mxu-bias == bias-in-kernel
a = qmm.quant_matmul_grouped(xin, qt, tile_idx, tm=tm, out_dtype=jnp.float32)
b = (qmm.quant_matmul_grouped(xin, qt_nobias, tile_idx, tm=tm,
                              out_dtype=jnp.float32)
     + bias_term_grouped(xin, bias_arr, tile_idx, tm, qt.group_size))
err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
print(json.dumps({"check": "mxu_bias_rel_err", "value": err}), flush=True)
