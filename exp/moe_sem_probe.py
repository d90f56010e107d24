"""Flip the grouped kernel's i axis to "parallel" (like the dense stacked
kernel) and re-time the chained call."""
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

def qbytes(v):
    return v.data.nbytes + v.scale.nbytes + (
        v.bias.nbytes if v.bias is not None else 0)

tm = 16
st, dest, sw, tile_idx, mp = jax.jit(
    lambda: build_groups(topi, topw, cfg.num_experts, tm))()
tile_idx = jax.device_put(tile_idx)
qt = bank1["gate"]
xin = jax.device_put(jnp.ones((int(mp), qt.shape[-1]), jnp.bfloat16) * 0.01)

def run_chain(tag):
    @jax.jit
    def chain25(q, xi):
        def body(x2, _):
            o = qmm.quant_matmul_grouped(x2, q, tile_idx, tm=tm,
                                         out_dtype=jnp.bfloat16)
            return (x2 * 0.999 + o[:, : x2.shape[1]] * 1e-6).astype(jnp.bfloat16), None
        x2, _ = jax.lax.scan(body, xi, None, length=25)
        return x2

    @jax.jit
    def chain05(q, xi):
        def body(x2, _):
            o = qmm.quant_matmul_grouped(x2, q, tile_idx, tm=tm,
                                         out_dtype=jnp.bfloat16)
            return (x2 * 0.999 + o[:, : x2.shape[1]] * 1e-6).astype(jnp.bfloat16), None
        x2, _ = jax.lax.scan(body, xi, None, length=5)
        return x2

    def t_of(f):
        jax.block_until_ready(f(qt, xin)); jax.block_until_ready(f(qt, xin))
        t0 = time.perf_counter()
        for _ in range(6):
            o = f(qt, xin)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / 6

    per = (t_of(chain25) - t_of(chain05)) / 20 * 1e3
    fl = qbytes(qt) / B.V5E_HBM_GBPS * 1e3
    print(json.dumps({"variant": tag, "per_call_ms": round(per, 3),
                      "eff": round(fl / per, 3)}), flush=True)

run_chain("baseline-arbitrary")

# patch the grouped kernel's dimension semantics in-module and re-jit
src_file = qmm.__file__
import re
orig = open(src_file).read()
assert orig.count('dimension_semantics=("arbitrary", "parallel", "arbitrary")') >= 1
patched = orig.replace(
    'dimension_semantics=("arbitrary", "parallel", "arbitrary")',
    'dimension_semantics=("parallel", "parallel", "arbitrary")')
open(src_file, "w").write(patched)
try:
    importlib.reload(qmm)
    jax.clear_caches()
    run_chain("i-parallel")
finally:
    open(src_file, "w").write(orig)
