"""Where do the NON-matmul 2.93 ms of the decode step go? (r5: plane-byte
cuts moved nothing — the matmul chain is VPU-pinned at ~7.85 ms; the
remaining slack vs the 8.43 ms roofline step is attention + residuals.)

Times, at the headline shape (llama-8B geometry, bs=8, depth 1024):
  attn-chain   32 fused paged-decode attention calls (write+attend) in one
               scan — vs the KV stream floor
  rest-chain   the full decode step MINUS matmuls and attention (norms,
               rope, residual adds, argmax) — XLA-fused elementwise cost
"""
import functools
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
from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

cfg = B.llama8b_cfg()
L, n_kv, hd, n_q = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
bs, CTX, BS = 8, 1024, 64
width = CTX // BS
S_total = bs * width * BS + BS  # + trash block


def emit(**kw):
    print(json.dumps(kw), flush=True)


k_pool = jnp.zeros((L, n_kv, S_total, hd), jnp.bfloat16)
v_pool = jnp.zeros((L, n_kv, S_total, hd), jnp.bfloat16)
bt = (jnp.arange(bs)[:, None] * width + jnp.arange(width)[None, :]).astype(jnp.int32)
kv_lens = jnp.full((bs,), CTX - 4, jnp.int32)
slots = (bt[jnp.arange(bs), (CTX - 5) // BS] * BS + (CTX - 5) % BS).astype(jnp.int32)
q0 = jnp.ones((bs, n_q, hd), jnp.bfloat16) * 0.01
kn = jnp.ones((bs, n_kv, hd), jnp.bfloat16) * 0.01


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3))
def attn_chain(n_steps, q, k_pool, v_pool):
    def step(carry, _):
        q, kp, vp = carry

        def layer(c, li):
            q, kp, vp = c
            o, kp, vp = paged_decode_attention_fused(
                q, kp, vp, kn, kn, slots, bt, kv_lens, layer=li,
                block_size=BS,
            )
            return (o.astype(jnp.bfloat16) * 0.5 + q * 0.5, kp, vp), None

        (q, kp, vp), _ = jax.lax.scan(
            layer, (q, kp, vp), jnp.arange(L, dtype=jnp.int32)
        )
        return (q, kp, vp), None

    (q, kp, vp), _ = jax.lax.scan(step, (q, k_pool, v_pool), None,
                                  length=n_steps)
    return q, kp, vp


def slope(build, n1=5, n2=25):
    global k_pool, v_pool
    times = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        out = build(n)
        jax.block_until_ready(out)
        times[n] = min(times.get(n, 1e9), time.perf_counter() - t0)
    return (times[n2] - times[n1]) / (n2 - n1) * 1e3


def run_attn(n):
    global k_pool, v_pool
    q, k_pool, v_pool = attn_chain(n, q0, k_pool, v_pool)
    return q


per = slope(run_attn)
kv_bytes = L * bs * CTX * n_kv * hd * 2 * 2  # K+V read
wr_bytes = L * bs * n_kv * hd * 2 * 2  # this step's writes (tiny)
floor = (kv_bytes + wr_bytes) / B.V5E_HBM_GBPS * 1e3
emit(probe="attn-chain", per_step_ms=round(per, 3),
     floor_ms=round(floor, 3), eff=round(floor / per, 3))

# lm_head: quantized [V, H] GEMV + argmax — part of the step's residual
# 2.93 ms (the matmul-chain probes exclude it). Floor ≈ 0.48 ms of plane
# bytes at Q4_K.
import importlib

qmm = importlib.import_module("mistralrs_tpu.ops.quant_matmul")
H = cfg.hidden_size
head_qt = B._rand_qtensor(jax.random.PRNGKey(7), (), cfg.vocab_size, H)
h0 = jnp.ones((bs, H), jnp.bfloat16) * 0.01


@functools.partial(jax.jit, static_argnums=(0,))
def head_chain(n_steps, h, qt):
    def step(h, _):
        logits = qmm.quant_matmul(h, qt, out_dtype=jnp.float32)
        tok = jnp.argmax(logits, axis=-1)
        return h * 0.999 + tok.astype(jnp.bfloat16)[:, None] * 1e-9, None

    h, _ = jax.lax.scan(step, h, None, length=n_steps)
    return h


def run_head(n):
    return head_chain(n, h0, head_qt)


per_h = slope(run_head)
hb = head_qt.data.nbytes + head_qt.scale.nbytes + (
    head_qt.bias.nbytes if head_qt.bias is not None else 0)
emit(probe="lm-head-chain", per_step_ms=round(per_h, 3),
     floor_ms=round(hb / B.V5E_HBM_GBPS * 1e3, 3),
     eff=round(hb / B.V5E_HBM_GBPS * 1e3 / per_h, 3))
