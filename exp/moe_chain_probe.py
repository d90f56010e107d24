"""Is the grouped-kernel gap per-call ramp or inner-loop? Time the same
grouped matmul as an N-iteration scan INSIDE one jit (the real decode
setting: 8 layers back-to-back), vs the single-call numbers (eff 0.39)."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import bench as B
import signal
signal.alarm(0)
from mistralrs_tpu.ops.moe_grouped import build_groups
from mistralrs_tpu.ops.quant_matmul import quant_matmul_grouped

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

@jax.jit
def chain(q, xi, n_steps):
    def body(x2, _):
        o = quant_matmul_grouped(x2, q, tile_idx, tm=tm, out_dtype=jnp.bfloat16)
        # feed a K-shaped projection back (data dependency like real layers)
        return (x2 * 0.999 + o[:, : x2.shape[1]] * 1e-6).astype(jnp.bfloat16), None
    x2, _ = jax.lax.scan(body, xi, None, length=25)
    return x2

@jax.jit
def chain5(q, xi):
    def body(x2, _):
        o = quant_matmul_grouped(x2, q, tile_idx, tm=tm, out_dtype=jnp.bfloat16)
        return (x2 * 0.999 + o[:, : x2.shape[1]] * 1e-6).astype(jnp.bfloat16), None
    x2, _ = jax.lax.scan(body, xi, None, length=5)
    return x2

def t_of(f, *a):
    jax.block_until_ready(f(*a)); jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(6):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / 6

t25 = t_of(lambda: chain(qt, xin, None))
t5 = t_of(lambda: chain5(qt, xin))
per = (t25 - t5) / 20 * 1e3
fl = qbytes(qt) / B.V5E_HBM_GBPS * 1e3
print(json.dumps({"chain_per_call_ms": round(per, 3), "floor": round(fl, 3),
                  "eff": round(fl / per, 3)}), flush=True)
