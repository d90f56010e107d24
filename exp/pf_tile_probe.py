"""Probe which (q_tile, chunk) configs compile within VMEM on hardware and
how fast they run at the bench prefill shape."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from mistralrs_tpu.kv.paged import write_kv
from mistralrs_tpu.ops.paged_attention import paged_prefill_attention_fused

rng = np.random.default_rng(0)


def probe(T, ctx, q_tile, chunk, n_kv=8, group=4, hd=128, bs=16, quant=None,
          B=1, iters=10):
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
    bt = np.stack([np.arange(b * width, (b + 1) * width) for b in range(B)]
                  ).astype(np.int32)
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

    def run():
        return paged_prefill_attention_fused(
            q, kp, vp, k_new, v_new, sm, btj, kv_lens, nv, 0, 0, ks, None,
            block_size=bs, q_tile=q_tile, chunk=chunk)[0]

    try:
        jax.block_until_ready(run())
    except Exception as e:
        msg = str(e)
        tag = "VMEM-OOM" if "vmem" in msg or "Scoped" in msg else "ERR"
        print(f"T={T} ctx={ctx} q_tile={q_tile} span={chunk*bs} quant={quant}"
              f" -> {tag}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        o = run()
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / iters * 1e3
    # ideal: ctx+T rows of K+V once (per layer)
    row_b = n_kv * hd * (1 if quant else 2) * 2
    gb = (ctx + T) * row_b * B / 1e9
    floor = gb / 0.8e3 * 1e3  # ~800 GB/s
    print(f"T={T} ctx={ctx} q_tile={q_tile} span={chunk*bs} quant={quant}"
          f" -> {ms:.3f} ms (1-pass stream floor {floor:.3f} ms)", flush=True)


shapes = [(512, 8192 - 512), (512, 2048)]
for T, ctx in shapes:
    for qt, ch in [(256, 8), (192, 8), (128, 16), (128, 8), (64, 16)]:
        probe(T, ctx, qt, ch)
probe(512, 8192 - 512, 256, 8, quant="int8")
probe(512, 8192 - 512, 128, 16, quant="int8")
probe(512, 8192 - 512, 128, 8, quant="int8")
# batched chunked prefill
probe(512, 4096, 128, 16, B=4)
probe(512, 4096, 256, 8, B=4)
print("done", flush=True)
