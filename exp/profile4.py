"""Decode-step ablation at bench shapes with the CURRENT default path
(stacked mm + MXU bias + fused PA kernel).

Variants (cumulative):
  A mm            — 4 stacked quant matmuls per layer (+ MXU bias)
  B mm+attn       — + fused paged-attention kernel (write+attend)
  C mm+attn+rope  — + rms norms, rope, residuals (full layer body)
  D full          — + lm_head + argmax feedback (≈ the real step)
All large arrays are ARGUMENTS (captured-constant lowering stalls the
axon relay).
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import llama8b_cfg, build_weights
from mistralrs_tpu.models.llama import fuse_projections
from mistralrs_tpu.kv.paged import PagedKVCache
from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused
from mistralrs_tpu.ops.norms import rms_norm
from mistralrs_tpu.ops.rope import apply_rope, rope_cos_sin, rope_frequencies
from mistralrs_tpu.quant.linear import LayerSlice, linear

OUT = open("/root/repo/exp/profile4.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


cfg = llama8b_cfg()
B, CTX, BS = 8, 1024, 64
num_blocks = B * CTX // BS
weights, _ = build_weights(cfg)
weights = fuse_projections(weights, cfg)
cache = PagedKVCache.create(cfg, num_blocks, BS)
width = CTX // BS
bt = (jnp.arange(B)[:, None] * width + jnp.arange(width)[None, :]).astype(jnp.int32)
start_len = CTX - 64
NH, NKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
L = cfg.num_layers


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


def make_chain(level):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers, embed, head, kp, vp):
        tok0 = jnp.zeros((B,), jnp.int32)
        lens0 = jnp.full((B,), start_len, jnp.int32)
        inv = rope_frequencies(HD, cfg.rope_theta)
        heavy = {k: v for k, v in layers.items()
                 if hasattr(v, "data")}

        def body(carry, _):
            kp, vp, tok, lens = carry
            slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)
            h = jnp.take(embed, tok, axis=0)[:, None, :]
            if level >= 2:
                cos, sin = rope_cos_sin(lens[:, None], inv)

            def layer(inner, si):
                kp, vp, hh = inner
                x = rms_norm(hh, layers["attn_norm"][0], 1e-5) if level >= 2 else hh
                qkv = linear(x, LayerSlice(heavy["wqkv"], si))
                q = qkv[..., : cfg.q_dim].reshape(B, 1, NH, HD)
                k = qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim].reshape(B, 1, NKV, HD)
                v = qkv[..., cfg.q_dim + cfg.kv_dim :].reshape(B, 1, NKV, HD)
                if level >= 2:
                    q = apply_rope(q, cos, sin)
                    k = apply_rope(k, cos, sin)
                if level >= 1:
                    attn, kp, vp = paged_decode_attention_fused(
                        q[:, 0], kp, vp, k[:, 0], v[:, 0], slots,
                        bt, lens + 1, 0, si, block_size=BS,
                    )
                    attn = attn.reshape(B, 1, NH * HD)
                else:
                    attn = q.reshape(B, 1, NH * HD) + k.sum() * 0 + v.sum() * 0
                ao = linear(attn, LayerSlice(heavy["wo"], si))
                hh = hh + ao
                x = rms_norm(hh, layers["ffn_norm"][0], 1e-5) if level >= 2 else hh
                gu = linear(x, LayerSlice(heavy["wgateup"], si))
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                hh = hh + linear(hid, LayerSlice(heavy["down"], si))
                return (kp, vp, hh), None

            (kp, vp, h), _ = jax.lax.scan(
                layer, (kp, vp, h), jnp.arange(L, dtype=jnp.int32)
            )
            if level >= 3:
                logits = linear(h[:, -1].astype(jnp.bfloat16), head).astype(jnp.float32)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tok = (h[:, -1, 0] * 0).astype(jnp.int32) + tok
            return (kp, vp, tok, lens + 1), None

        (kp, vp, tok, lens), _ = jax.lax.scan(
            body, (kp, vp, tok0, lens0), None, length=n_steps
        )
        return tok

    return chain


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "0123"
    args = (weights["layers"], weights["embed"], weights["lm_head"],
            cache.k, cache.v)
    names = {0: "A_mm", 1: "B_mm_attn", 2: "C_mm_attn_rope", 3: "D_full"}
    for lvl in sorted(int(c) for c in which):
        t = slope_time(make_chain(lvl), args)
        emit(what=names[lvl], ms=round(t * 1e3, 3), tok_s=round(B / t, 1))


main()
