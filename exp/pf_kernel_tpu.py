"""On-TPU validation + timing of the paged prefill/verify kernel vs the
gather path, at llama3-8b geometry."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from mistralrs_tpu.kv.paged import write_kv, gather_kv
from mistralrs_tpu.ops.attention import sdpa
from mistralrs_tpu.ops.paged_attention import paged_prefill_attention_fused

print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(0)


def case(B, T, ctx, n_kv=8, group=4, hd=128, bs=16, quant=None, iters=20,
         q_tile=None, chunk=None):
    n_q = n_kv * group
    n_blocks = (B * (ctx + T)) // bs + B + 2
    S = (n_blocks + 1) * bs
    if quant:
        store = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
        kp = jnp.zeros((n_kv, S, hd), store)
        vp = jnp.zeros((n_kv, S, hd), store)
        ks = jnp.zeros((S, 128), jnp.bfloat16)
    else:
        kp = jnp.zeros((n_kv, S, hd), jnp.bfloat16)
        vp = jnp.zeros((n_kv, S, hd), jnp.bfloat16)
        ks = None
    width = (ctx + T + bs - 1) // bs
    bt = np.zeros((B, width), np.int32)
    nxt = 0
    for b in range(B):
        bt[b] = np.arange(nxt, nxt + width)
        nxt += width
    # fill ctx
    if ctx:
        for b in range(B):
            kc = jnp.asarray(rng.standard_normal((ctx, n_kv, hd)), jnp.bfloat16)
            vc = jnp.asarray(rng.standard_normal((ctx, n_kv, hd)), jnp.bfloat16)
            pos = np.arange(ctx)
            slots = bt[b][pos // bs] * bs + pos % bs
            kp, vp, ks = write_kv(kp, vp, kc, vc, jnp.asarray(slots), ks)
    q = jnp.asarray(rng.standard_normal((B, T, n_q, hd)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.bfloat16)
    slot_map = np.zeros((B, T), np.int64)
    for b in range(B):
        pos = np.arange(ctx, ctx + T)
        slot_map[b] = bt[b][pos // bs] * bs + pos % bs
    kv_lens = jnp.full((B,), ctx + T, jnp.int32)
    nv = jnp.full((B,), T, jnp.int32)
    sm = jnp.asarray(slot_map, jnp.int32)
    btj = jnp.asarray(bt)

    outs = paged_prefill_attention_fused(
        q, kp, vp, k_new, v_new, sm, btj, kv_lens, nv, 0, 0, ks, None,
        block_size=bs, q_tile=q_tile, chunk=chunk)
    out = outs[0]
    # reference
    kp_r, vp_r, ks_r = kp, vp, ks
    for b in range(B):
        kp_r, vp_r, ks_r = write_kv(kp_r, vp_r, k_new[b], v_new[b],
                                    jnp.asarray(slot_map[b]), ks_r)
    kk, vv = gather_kv(kp_r, vp_r, btj, bs, ks_r)
    positions = jnp.broadcast_to(jnp.arange(ctx, ctx + T)[None], (B, T))
    ref = sdpa(q, kk, vv, q_positions=positions, kv_len=kv_lens)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    # code parity
    dk = np.abs(np.asarray(outs[1], np.float32) - np.asarray(kp_r, np.float32))
    perr = dk[:, : S - bs].max()

    # timing: kernel
    def k_run():
        o = paged_prefill_attention_fused(
            q, kp, vp, k_new, v_new, sm, btj, kv_lens, nv, 0, 0, ks, None,
            block_size=bs, q_tile=q_tile, chunk=chunk)
        return o[0]
    k_run()
    jax.block_until_ready(k_run())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = k_run()
    jax.block_until_ready(o)
    t_kernel = (time.perf_counter() - t0) / iters * 1e3

    # timing: gather path (write + gather + sdpa, one layer equivalent)
    @jax.jit
    def g_run(kp, vp, ks):
        kpl, vpl, ksl = kp, vp, ks
        for b in range(B):
            kpl, vpl, ksl = write_kv(kpl, vpl, k_new[b], v_new[b],
                                     jnp.asarray(slot_map[b]), ksl)
        kk, vv = gather_kv(kpl, vpl, btj, bs, ksl)
        return sdpa(q, kk, vv, q_positions=positions, kv_len=kv_lens)
    jax.block_until_ready(g_run(kp, vp, ks))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = g_run(kp, vp, ks)
    jax.block_until_ready(o)
    t_gather = (time.perf_counter() - t0) / iters * 1e3

    print(f"B={B} T={T} ctx={ctx} quant={quant} q_tile={q_tile} "
          f"err={err:.4f} pool_err={perr:.4f} kernel={t_kernel:.3f}ms "
          f"gather={t_gather:.3f}ms speedup={t_gather/t_kernel:.2f}x",
          flush=True)


# verify shape (speculative γ=7)
case(B=8, T=8, ctx=1024)
# chunked prefill at depth
case(B=1, T=512, ctx=2048, q_tile=256, chunk=8)
case(B=1, T=512, ctx=8192 - 512, q_tile=256, chunk=8)
case(B=1, T=512, ctx=8192 - 512, quant="int8", q_tile=256, chunk=8)
case(B=4, T=512, ctx=4096, q_tile=256, chunk=8)
case(B=1, T=512, ctx=2048, q_tile=128, chunk=8)
case(B=1, T=512, ctx=8192 - 512, q_tile=128, chunk=8)
print("done")
