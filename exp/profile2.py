"""Post-stacked-refactor decomposition: where does the 23.4 ms decode step
live now? Components, slope-timed:
1. production full step (forward_paged, gather path)
2. stacked matmul chain WITH bias planes (the production QTensors)
3. stacked matmul chain WITHOUT bias (mirror of stack_mm result 8.3 ms)
4. attention-only chain (pool slice + write_kv + gather + sdpa per layer)
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import llama8b_cfg, build_weights
from mistralrs_tpu.models.llama import forward_paged, fuse_projections
from mistralrs_tpu.kv.paged import PagedKVCache, write_kv, gather_kv
from mistralrs_tpu.ops.attention import sdpa
from mistralrs_tpu.quant.linear import linear, LayerSlice
from mistralrs_tpu.generate import _freeze
import dataclasses

OUT = open("/root/repo/exp/profile2.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


cfg = llama8b_cfg()
fcfg = _freeze(cfg)
B, CTX, BS = 8, 1024, 64
num_blocks = B * CTX // BS
weights, weight_bytes = build_weights(cfg)
weights = fuse_projections(weights, cfg)
cache = PagedKVCache.create(cfg, num_blocks, BS)
width = CTX // BS
block_tables = (
    jnp.arange(B)[:, None] * width + jnp.arange(width)[None, :]
).astype(jnp.int32)
start_len = CTX - 64


def slope_time(fn, args, n1=5, n2=25, reps=3):
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


# ---- 1. production full step ----------------------------------------------


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


# ---- 2/3. stacked matmul chains -------------------------------------------


def make_mm_chain(layers):
    @functools.partial(jax.jit, static_argnums=(0,))
    def mm_chain(n_steps, layers):
        x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

        def step(x, _):
            def layer(h, si):
                qkv = linear(h, LayerSlice(layers["wqkv"], si))
                q = qkv[..., : cfg.q_dim]
                ao = linear(q, LayerSlice(layers["wo"], si))
                gu = linear(ao, LayerSlice(layers["wgateup"], si))
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return linear(hid, LayerSlice(layers["down"], si)), None

            y, _ = jax.lax.scan(
                layer, x, jnp.arange(cfg.num_layers, dtype=jnp.int32)
            )
            return 0.999 * y, None

        y, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return y

    return mm_chain


# ---- 4. attention-only chain ----------------------------------------------


@functools.partial(jax.jit, static_argnums=(0,))
def attn_chain(n_steps, cache, bt):
    lens0 = jnp.full((B,), start_len, jnp.int32)
    q0 = jnp.ones((B, 1, cfg.num_heads, cfg.head_dim), jnp.bfloat16) * 0.02
    kv0 = jnp.ones((B, cfg.num_kv_heads, cfg.head_dim), jnp.bfloat16) * 0.02

    def body(carry, _):
        kp, vp, q, lens = carry
        slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)

        def layer(inner, li):
            kp, vp, acc = inner
            k_c = jax.lax.dynamic_index_in_dim(kp, li, 0, keepdims=False)
            v_c = jax.lax.dynamic_index_in_dim(vp, li, 0, keepdims=False)
            k_c, v_c, _, _ = write_kv(
                k_c, v_c, kv0 + acc[:, 0, : cfg.num_kv_heads],
                kv0, slots, None, None,
            )
            kp = jax.lax.dynamic_update_index_in_dim(kp, k_c, li, 0)
            vp = jax.lax.dynamic_update_index_in_dim(vp, v_c, li, 0)
            kk, vv = gather_kv(k_c, v_c, bt, BS, None, None, dtype=jnp.bfloat16)
            attn = sdpa(q + acc, kk, vv, q_positions=lens[:, None],
                        kv_len=lens + 1)
            return (kp, vp, acc + attn * 1e-3), None

        (kp, vp, acc), _ = jax.lax.scan(
            layer, (kp, vp, jnp.zeros_like(q)),
            jnp.arange(cfg.num_layers, dtype=jnp.int32),
        )
        return (kp, vp, q + acc * 1e-3, lens + 1), None

    (kp, vp, q, lens), _ = jax.lax.scan(
        body, (cache.k, cache.v, q0, lens0), None, length=n_steps
    )
    return q


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    layers = weights["layers"]
    if which in ("all", "mm"):
        t = slope_time(make_mm_chain(layers), (layers,))
        emit(what="stacked_bias_mm_ms", value=round(t * 1e3, 3))
        nb = {}
        for k in ("wqkv", "wo", "wgateup", "down"):
            nb[k] = dataclasses.replace(layers[k], bias=None)
        t = slope_time(make_mm_chain(nb), (nb,))
        emit(what="stacked_nobias_mm_ms", value=round(t * 1e3, 3))
    if which in ("all", "attn"):
        t = slope_time(attn_chain, (cache, block_tables))
        emit(what="attn_only_ms", value=round(t * 1e3, 3))
    if which in ("all", "full"):
        t = slope_time(full_chain, (weights, cache, block_tables))
        emit(what="full_step_ms", value=round(t * 1e3, 3),
             tok_s=round(B / t, 1))
    emit(what="done", which=which)


if __name__ == "__main__":
    main()
