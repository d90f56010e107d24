"""Microbench: fused paged-decode kernel at the bench geometry (llama3-8b,
bs=8, ctx=1024, BS=64), scanned over 32 layers like the real step. Reports
ms per 32-layer attention pass. Usage: python exp/pa_micro.py [ctx] [bs]"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
import os
L, n_kv, group, hd = 32, 8, 4, 128
BS = int(os.environ.get("BS", "64"))
CHUNK = os.environ.get("CHUNK")
CHUNK = int(CHUNK) if CHUNK else None
S = B * CTX + BS
W = CTX // BS

key = jax.random.PRNGKey(0)
k_pool = jax.random.normal(key, (L, n_kv, S, hd), jnp.bfloat16)
v_pool = jax.random.normal(key, (L, n_kv, S, hd), jnp.bfloat16)
q = jax.random.normal(key, (B, n_kv * group, hd), jnp.bfloat16)
k_new = jax.random.normal(key, (B, n_kv, hd), jnp.bfloat16)
v_new = jax.random.normal(key, (B, n_kv, hd), jnp.bfloat16)
bt = (jnp.arange(B)[:, None] * W + jnp.arange(W)[None, :]).astype(jnp.int32)
lens = jnp.full((B,), CTX - 1, jnp.int32)
slots = (bt[:, -1] * BS + (CTX - 1) % BS).astype(jnp.int32)


def chain(n):
    @jax.jit
    def f(q, k_pool, v_pool):
        def body(carry, li):
            qq, kp, vp = carry
            o, kp, vp = paged_decode_attention_fused(
                qq, kp, vp, k_new, v_new, slots, bt, lens, 0, li, None, None,
                block_size=BS, chunk=CHUNK,
            )
            # feed output back so steps serialize
            return (o.astype(qq.dtype), kp, vp), None

        def step(carry, _):
            carry, _ = jax.lax.scan(body, carry, jnp.arange(L, dtype=jnp.int32))
            return carry, None

        (qq, kp, vp), _ = jax.lax.scan(step, (q, k_pool, v_pool), None, length=n)
        return qq

    return f


def run(f, *a):
    t0 = time.perf_counter()
    np.asarray(f(*a))
    return time.perf_counter() - t0


f1, f2 = chain(3), chain(13)
run(f1, q, k_pool, v_pool); run(f2, q, k_pool, v_pool)
t1 = min(run(f1, q, k_pool, v_pool) for _ in range(3))
t2 = min(run(f2, q, k_pool, v_pool) for _ in range(3))
ms = (t2 - t1) / 10 * 1e3
kv_bytes = 2 * L * B * CTX * n_kv * hd * 2
print(f"attn 32-layer pass: {ms:.3f} ms  (KV {kv_bytes/1e6:.0f} MB -> "
      f"floor {kv_bytes/819e9*1e3:.3f} ms, frac {kv_bytes/819e9*1e3/ms:.2f})")
