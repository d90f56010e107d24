"""Bisect the fused paged-decode kernel's ~9-min cold compile.

Times AOT lower+compile of:
  k_alone_cN   — standalone kernel, chunk N, table W=128 (2048 slots)
  k_scan       — kernel inside a 32-iteration lax.scan over 4-D pools
                 (the exact serving structure: aliased pools in the carry)
  model_kernel — full 8B-geometry forward_paged with the kernel path
  model_gather — same with force_gather (the known-fast baseline)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/exp/ktime.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

B, NKV, GRP, HD, BS, W, L = 8, 8, 4, 128, 16, 128, 32
S = W * BS  # 2048 slots


def time_compile(name, fn, *args):
    t0 = time.time()
    lowered = fn.lower(*args) if hasattr(fn, "lower") else jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    emit(what=name, lower_s=round(t1 - t0, 2), compile_s=round(t2 - t1, 2))
    return compiled


def kernel_args(l4=False):
    q = jnp.zeros((B, NKV * GRP, HD), jnp.bfloat16)
    shape = (L, NKV, S, HD) if l4 else (NKV, S, HD)
    kp = jnp.zeros(shape, jnp.bfloat16)
    vp = jnp.zeros(shape, jnp.bfloat16)
    kn = jnp.zeros((B, NKV, HD), jnp.bfloat16)
    vn = jnp.zeros((B, NKV, HD), jnp.bfloat16)
    slots = jnp.zeros((B,), jnp.int32)
    bt = jnp.zeros((B, W), jnp.int32)
    kl = jnp.ones((B,), jnp.int32)
    return q, kp, vp, kn, vn, slots, bt, kl


def standalone(chunk):
    q, kp, vp, kn, vn, slots, bt, kl = kernel_args()

    def f(q, kp, vp, kn, vn, slots, bt, kl):
        return paged_decode_attention_fused(
            q, kp, vp, kn, vn, slots, bt, kl, 0, 0,
            block_size=BS, chunk=chunk,
        )

    time_compile(f"k_alone_c{chunk}", jax.jit(f), q, kp, vp, kn, vn, slots, bt, kl)


def scan_model():
    q, kp, vp, kn, vn, slots, bt, kl = kernel_args(l4=True)

    def f(q, kp, vp, kn, vn, slots, bt, kl):
        def body(carry, li):
            kp, vp = carry
            o, kp, vp = paged_decode_attention_fused(
                q, kp, vp, kn, vn, slots, bt, kl, 0, li, block_size=BS
            )
            return (kp, vp), o

        (kp, vp), os_ = jax.lax.scan(body, (kp, vp), jnp.arange(L))
        return os_.sum(), kp, vp

    time_compile("k_scan32", jax.jit(f), q, kp, vp, kn, vn, slots, bt, kl)


def full_model(force_gather):
    sys.path.insert(0, "/root/repo")
    import bench

    cfg = bench.llama8b_cfg()
    weights, _ = bench.build_weights(cfg)
    from mistralrs_tpu.generate import _freeze
    from mistralrs_tpu.kv.paged import PagedKVCache
    from mistralrs_tpu.models.llama import forward_paged

    fcfg = _freeze(cfg)
    cache = PagedKVCache.create(cfg, W, BS, dtype=jnp.bfloat16)
    ids = jnp.zeros((B, 1), jnp.int32)
    pos = jnp.zeros((B, 1), jnp.int32)
    bt = jnp.zeros((B, W // B), jnp.int32)  # 16 blocks/seq = 256 slots... keep W wide:
    bt = jnp.zeros((B, W), jnp.int32)
    sm = jnp.zeros((B,), jnp.int32)
    kl = jnp.ones((B,), jnp.int32)

    def f(weights, ids, pos, cache, bt, sm, kl):
        return forward_paged(
            weights, fcfg, ids, pos, cache, bt, sm, kl,
            block_size=BS, logits_last_only=True,
            force_gather=force_gather,
        )

    name = "model_gather" if force_gather else "model_kernel"
    time_compile(name, jax.jit(f), weights, ids, pos, cache, bt, sm, kl)


mode = sys.argv[1] if len(sys.argv) > 1 else "all"
if mode in ("all", "alone"):
    standalone(32)
    standalone(8)
if mode in ("all", "scan"):
    scan_model()
if mode in ("all", "model"):
    full_model(True)
    full_model(False)
emit(what="done", mode=mode)
