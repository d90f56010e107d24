"""Probe: does Mosaic lower dot_general(s8, s8 -> s32) on v5e? And at what
throughput vs f32/bf16 dots at decode M? Also probes s4 and mixed s8xbf16."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8, 2048, 1024


def mk(dt_x, dt_w, pref):
    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=pref,
        ).astype(o_ref.dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), pref),
        )(x, w)

    return run


key = jax.random.PRNGKey(0)
xf = jax.random.normal(key, (M, K), jnp.float32)
wf = jax.random.normal(key, (K, N), jnp.float32)

cases = [
    ("s8xs8->s32", xf.astype(jnp.int8), wf.astype(jnp.int8), jnp.int32),
    ("s8xbf16->f32", xf.astype(jnp.int8), wf.astype(jnp.bfloat16), jnp.float32),
    ("s4xs8->s32", xf.astype(jnp.int4), wf.astype(jnp.int8), jnp.int32),
    ("bf16->f32", xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16), jnp.float32),
    ("f32->f32", xf, wf, jnp.float32),
]
for name, x, w, pref in cases:
    try:
        run = mk(x.dtype, w.dtype, pref)
        out = run(x, w)
        np.asarray(out)
        # timing: 100 reps
        t0 = time.perf_counter()
        for _ in range(100):
            out = run(x, w)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 100
        print(f"{name}: OK {dt*1e6:.1f} us")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
