"""Decode-attention efficiency vs paged block size: per-block DMA
descriptor issue cost is per-block; bigger blocks → fewer descriptors."""
import functools, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import bench as B
import signal
signal.alarm(0)
from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

cfg = B.llama8b_cfg()
L, n_kv, hd, n_q = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
bs, CTX = 8, 1024

def emit(**kw):
    print(json.dumps(kw), flush=True)

for BS in (64, 128, 256, 512):
    width = CTX // BS
    S_total = bs * width * BS + BS
    k_pool = jnp.zeros((L, n_kv, S_total, hd), jnp.bfloat16)
    v_pool = jnp.zeros((L, n_kv, S_total, hd), jnp.bfloat16)
    bt = (jnp.arange(bs)[:, None] * width + jnp.arange(width)[None, :]).astype(jnp.int32)
    kv_lens = jnp.full((bs,), CTX - 4, jnp.int32)
    slots = (bt[jnp.arange(bs), (CTX - 5) // BS] * BS + (CTX - 5) % BS).astype(jnp.int32)
    q0 = jnp.ones((bs, n_q, hd), jnp.bfloat16) * 0.01
    kn = jnp.ones((bs, n_kv, hd), jnp.bfloat16) * 0.01

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3, 4))
    def attn_chain(n_steps, BS_, q, k_pool, v_pool):
        def step(carry, _):
            q, kp, vp = carry
            def layer(c, li):
                q, kp, vp = c
                o, kp, vp = paged_decode_attention_fused(
                    q, kp, vp, kn, kn, slots, bt, kv_lens, layer=li,
                    block_size=BS_,
                )
                return (o.astype(jnp.bfloat16) * 0.5 + q * 0.5, kp, vp), None
            (q, kp, vp), _ = jax.lax.scan(
                layer, (q, kp, vp), jnp.arange(L, dtype=jnp.int32))
            return (q, kp, vp), None
        (q, kp, vp), _ = jax.lax.scan(step, (q, k_pool, v_pool), None,
                                      length=n_steps)
        return q, kp, vp

    state = [k_pool, v_pool]
    def run(n):
        q, state[0], state[1] = attn_chain(n, BS, q0, state[0], state[1])
        return q

    times = {}
    for n in (5, 25, 5, 25):
        t0 = time.perf_counter()
        out = run(n)
        jax.block_until_ready(out)
        times[n] = min(times.get(n, 1e9), time.perf_counter() - t0)
    per = (times[25] - times[5]) / 20 * 1e3
    kv_bytes = L * bs * CTX * n_kv * hd * 2 * 2
    floor = kv_bytes / B.V5E_HBM_GBPS * 1e3
    emit(block_size=BS, per_step_ms=round(per, 3), floor=round(floor, 3),
         eff=round(floor / per, 3))
    del k_pool, v_pool, state
