"""Decompose the bench decode step (bs=8, ctx=1024, llama3-8b Q4_K) into
component times on the real TPU. Slope-timed (two scan lengths, np.asarray
materialization — see memory: block_until_ready lies over the axon relay).
Weights/cache are passed as ARGUMENTS (closing over them stalls compiles).

Writes JSON lines to exp/profile_decode.out.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.llama import forward_paged, fuse_projections
from mistralrs_tpu.kv.paged import PagedKVCache, write_kv, gather_kv
from mistralrs_tpu.ops.attention import sdpa
from mistralrs_tpu.quant.linear import linear
from mistralrs_tpu.generate import _freeze

from bench import llama8b_cfg, build_weights

OUT = open("/root/repo/exp/profile_decode.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def slope_time(fn, args, n1=5, n2=25, reps=3):
    """fn(n_steps, *args) jitted with static n_steps."""

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    run(n1)
    run(n2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


cfg = llama8b_cfg()
fcfg = _freeze(cfg)
B, CTX, BS = 8, 1024, 64
num_blocks = B * CTX // BS
weights, weight_bytes = build_weights(cfg)
weights = fuse_projections(weights, cfg)
emit(what="weight_bytes", value=weight_bytes)

cache = PagedKVCache.create(cfg, num_blocks, BS)
width = CTX // BS
block_tables = (
    jnp.arange(B)[:, None] * width + jnp.arange(width)[None, :]
).astype(jnp.int32)
start_len = CTX - 64

# ---- 1. full step --------------------------------------------------------

import functools


@functools.partial(jax.jit, static_argnums=(0,))
def full_chain(n_steps, weights, cache, bt):
    tokens0 = jnp.zeros((B,), jnp.int32)
    lens0 = jnp.full((B,), start_len, jnp.int32)

    def body(carry, _):
        c, tokens, lens = carry
        slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)
        logits, c = forward_paged(
            weights, fcfg, tokens[:, None], lens[:, None], c,
            bt, slots[:, None], lens + 1,
            block_size=BS, logits_last_only=True,
        )
        tokens = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (c, tokens, lens + 1), None

    (c, tokens, lens), _ = jax.lax.scan(
        body, (cache, tokens0, lens0), None, length=n_steps
    )
    return tokens


t = slope_time(full_chain, (weights, cache, block_tables))
emit(what="full_step_ms", value=round(t * 1e3, 3), tok_s=round(B / t, 1))

# ---- 2. per-layer matmuls only (weight streaming at decode M=8) ----------


@functools.partial(jax.jit, static_argnums=(0,))
def matmul_chain(n_steps, layers):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def step(x, _):
        def layer(h, lw):
            qkv = linear(h, lw["wqkv"])
            q = qkv[..., : cfg.q_dim]
            ao = linear(q, lw["wo"])
            gu = linear(ao, lw["wgateup"])
            half = gu.shape[-1] // 2
            hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
            return linear(hid, lw["down"]), None

        y, _ = jax.lax.scan(layer, x, layers)
        return 0.999 * y, None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


t = slope_time(matmul_chain, (weights["layers"],))
emit(what="layer_matmuls_ms", value=round(t * 1e3, 3))

# ---- 3. lm_head ----------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0,))
def head_chain(n_steps, head):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def step(x, _):
        logits = linear(x, head)
        return x * 0.999 + logits[:, : cfg.hidden_size].astype(x.dtype) * 1e-6, None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


t = slope_time(head_chain, (weights["lm_head"],))
emit(what="lm_head_ms", value=round(t * 1e3, 3))

# ---- 4. attention only (write + gather + sdpa over the pool carry) -------


@functools.partial(jax.jit, static_argnums=(0,))
def attn_chain(n_steps, kp0, vp0, bt):
    q0 = jnp.ones((B, 1, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    kn = jnp.ones((B, cfg.num_kv_heads, cfg.head_dim), jnp.bfloat16)
    lens0 = jnp.full((B,), start_len, jnp.int32)

    def step(carry, _):
        kp, vp, q, lens = carry
        slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)

        def layer(c2, li):
            kp, vp, q = c2
            k_c = jax.lax.dynamic_index_in_dim(kp, li, 0, keepdims=False)
            v_c = jax.lax.dynamic_index_in_dim(vp, li, 0, keepdims=False)
            k_c, v_c, _, _ = write_kv(k_c, v_c, kn, kn, slots)
            kp = jax.lax.dynamic_update_index_in_dim(kp, k_c, li, 0)
            vp = jax.lax.dynamic_update_index_in_dim(vp, v_c, li, 0)
            kk, vv = gather_kv(k_c, v_c, bt, BS)
            attn = sdpa(q, kk, vv, q_positions=lens[:, None], kv_len=lens + 1)
            return (kp, vp, attn.astype(q.dtype) * 1e-3 + q * 0.999), None

        (kp, vp, q), _ = jax.lax.scan(
            layer, (kp, vp, q), jnp.arange(cfg.num_layers, dtype=jnp.int32)
        )
        return (kp, vp, q, lens + 1), None

    (kp, vp, q, lens), _ = jax.lax.scan(
        step, (kp0, vp0, q0, lens0), None, length=n_steps
    )
    return q


t = slope_time(attn_chain, (cache.k, cache.v, block_tables))
emit(what="attn_gather_ms", value=round(t * 1e3, 3))

emit(what="done")
