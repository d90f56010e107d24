"""Composition ablation: mm-only (10.26), attn-only (5.02), but full step
is 23.4 — find the ~6.5 ms of composition overhead.

Variants (same body structure as forward_paged, hand-composed):
  mm+attn       : matmuls + paged write/gather/sdpa per layer, no lm_head
  mm+attn+head  : + w8 lm_head + argmax feedback
  mm+attn+rope  : + real rope/norms per layer (full fidelity minus head)
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
from mistralrs_tpu.models.llama import fuse_projections
from mistralrs_tpu.kv.paged import PagedKVCache, write_kv, gather_kv
from mistralrs_tpu.ops.attention import sdpa
from mistralrs_tpu.ops.norms import rms_norm
from mistralrs_tpu.ops.rope import apply_rope, rope_cos_sin, rope_frequencies
from mistralrs_tpu.quant.linear import linear, LayerSlice
from mistralrs_tpu.generate import _freeze

OUT = open("/root/repo/exp/profile3.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


cfg = llama8b_cfg()
B, CTX, BS = 8, 1024, 64
num_blocks = B * CTX // BS
weights, weight_bytes = build_weights(cfg)
weights = fuse_projections(weights, cfg)
cache = PagedKVCache.create(cfg, num_blocks, BS)
width = CTX // BS
bt = (jnp.arange(B)[:, None] * width + jnp.arange(width)[None, :]).astype(jnp.int32)
start_len = CTX - 64
NH, NKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim


def slope_time(fn, args, n1=5, n2=25, reps=3):
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    run(n1), run(n2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def make_chain(with_head, with_rope):
    layers = weights["layers"]

    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers, kp, vp, head):
        tok0 = jnp.zeros((B,), jnp.int32)
        lens0 = jnp.full((B,), start_len, jnp.int32)
        inv = rope_frequencies(HD, cfg.rope_theta)

        def body(carry, _):
            kp, vp, tok, lens = carry
            slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)
            h = jnp.take(weights["embed"], tok, axis=0)[:, None, :]
            if with_rope:
                cos, sin = rope_cos_sin(lens[:, None], inv)

            def layer(inner, si):
                kp, vp, hh = inner
                x = rms_norm(hh, layers["attn_norm"][0], 1e-5) if with_rope else hh
                qkv = linear(x, LayerSlice(layers["wqkv"], si))
                q = qkv[..., : cfg.q_dim].reshape(B, 1, NH, HD)
                k = qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim].reshape(B, 1, NKV, HD)
                v = qkv[..., cfg.q_dim + cfg.kv_dim :].reshape(B, 1, NKV, HD)
                if with_rope:
                    q = apply_rope(q, cos, sin)
                    k = apply_rope(k, cos, sin)
                k_c = jax.lax.dynamic_index_in_dim(kp, si, 0, keepdims=False)
                v_c = jax.lax.dynamic_index_in_dim(vp, si, 0, keepdims=False)
                k_c, v_c, _, _ = write_kv(
                    k_c, v_c, k.reshape(B, NKV, HD), v.reshape(B, NKV, HD),
                    slots, None, None,
                )
                kp = jax.lax.dynamic_update_index_in_dim(kp, k_c, si, 0)
                vp = jax.lax.dynamic_update_index_in_dim(vp, v_c, si, 0)
                kk, vv = gather_kv(k_c, v_c, bt, BS, None, None, dtype=jnp.bfloat16)
                attn = sdpa(q, kk, vv, q_positions=lens[:, None], kv_len=lens + 1)
                attn = attn.reshape(B, 1, NH * HD)
                ao = linear(attn, LayerSlice(layers["wo"], si))
                hh = hh + ao
                x = rms_norm(hh, layers["ffn_norm"][0], 1e-5) if with_rope else hh
                gu = linear(x, LayerSlice(layers["wgateup"], si))
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                hh = hh + linear(hid, LayerSlice(layers["down"], si))
                return (kp, vp, hh), None

            (kp, vp, h), _ = jax.lax.scan(
                layer, (kp, vp, h), jnp.arange(cfg.num_layers, dtype=jnp.int32)
            )
            if with_head:
                logits = linear(h[:, -1].astype(jnp.bfloat16), head).astype(jnp.float32)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tok = (jnp.sum(h[:, -1, :8], axis=-1) * 0).astype(jnp.int32) + tok
            return (kp, vp, tok, lens + 1), None

        (kp, vp, tok, lens), _ = jax.lax.scan(
            body, (kp, vp, tok0, lens0), None, length=n_steps
        )
        return tok

    return chain, layers


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    head_t = weights["lm_head"]
    if which in ("all", "a"):
        chain, layers = make_chain(with_head=False, with_rope=False)
        t = slope_time(chain, (layers, cache.k, cache.v, head_t))
        emit(what="mm_attn_ms", value=round(t * 1e3, 3))
    if which in ("all", "b"):
        chain, layers = make_chain(with_head=True, with_rope=True)
        t = slope_time(chain, (layers, cache.k, cache.v, head_t))
        emit(what="mm_attn_rope_head_ms", value=round(t * 1e3, 3),
             tok_s=round(B / t, 1))
    emit(what="done", which=which)


if __name__ == "__main__":
    main()
