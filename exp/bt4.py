"""Bit-trick w4, round 4: exact-precision scale application.

All variants use the reordered pack (pack_ro: group-of-row cycles mod gq so
scale words tile with pltpu.repeat) + x columns permuted outside the kernel.

- swrep_ro: wd = wbf*se + be            (2 ops/wt; CANCELLATION — reference)
- sub_ro:   wd = (wbf - 128)*se, bias via xg = x@G then xg@b_f32 on the
            accumulator                  (2 ops/wt; exact, bf16 dot)
- f32w_ro:  wd = f32(wbf)*f32(se) [exact product], f32 dot; bias via xg@b
            (widening mul; exact, f32 dot)

Precision reference: bf16 XLA-dequant path error on the same data.
Writes JSON lines to exp/bt4.out.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

OUT = open("/root/repo/exp/bt4.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


BASE = 0x43004300
MASK = 0x000F000F
GS = 32


def _ext(w, q):
    return ((w >> (4 * q)) & MASK) | BASE if q else (w & MASK) | BASE


def quarter_perm(tw):
    gq = 2 * tw // GS
    r = np.arange(2 * tw)
    return (r % gq) * GS + r // gq


def pack_ro(codes, tw):
    k, n = codes.shape
    perm = quarter_perm(tw)
    words = np.zeros((k // 8, n), np.uint32)
    for t in range(k // (8 * tw)):
        tile = codes[t * 8 * tw : (t + 1) * 8 * tw]
        for nib in range(8):
            q, h = nib % 4, nib // 4
            rows = perm[2 * np.arange(tw) + h] + q * 2 * tw
            words[t * tw : (t + 1) * tw] |= tile[rows].astype(np.uint32) << (4 * nib)
    return words.view(np.int32)


def x_perm(k, tw):
    perm = quarter_perm(tw)
    cols = np.zeros((k,), np.int64)
    for t in range(k // (8 * tw)):
        for q in range(4):
            base = t * 8 * tw + q * 2 * tw
            cols[base : base + 2 * tw] = base + perm
    return cols


def b16(v):
    return np.asarray(v, np.float32).astype(jnp.bfloat16).view(np.uint16)


def pack_scale_words_ro(plane, tw, k):
    """[K/GS, N] -> [n_tiles, 4, gq/2, N] int32 (one tiling period/quarter)."""
    gq = 2 * tw // GS
    n = plane.shape[1]
    perm = quarter_perm(tw)
    nt = k // (8 * tw)
    out = np.zeros((nt, 4, gq // 2, n), np.uint32)
    for t in range(nt):
        for q in range(4):
            g0 = (t * 8 * tw + q * 2 * tw) // GS
            for j in range(gq // 2):
                glo = g0 + perm[2 * j] // GS
                ghi = g0 + perm[2 * j + 1] // GS
                out[t, q, j] = (
                    b16(plane[glo]).astype(np.uint32)
                    | (b16(plane[ghi]).astype(np.uint32) << 16)
                )
    return out.view(np.int32)


def gsum_matrix_ro(tw):
    """[8*tw, gpt] 0/1: group id of PERMUTED x column r (for xg = x' @ G)."""
    gpt = 8 * tw // GS
    perm = quarter_perm(tw)
    g = np.zeros((8 * tw, gpt), np.float32)
    for q in range(4):
        for r in range(2 * tw):
            orig = q * 2 * tw + perm[r]
            g[q * 2 * tw + r, orig // GS] = 1.0
    return g


def _kern(x_ref, p_ref, sw_ref, bw_ref, bf_ref, g_ref, o_ref, acc_ref, *,
          reps, variant):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    x = x_ref[...]
    if variant in ("sub_ro", "f32w_ro"):
        # bias on the accumulator: acc += (x @ G) @ b_f32
        xg = jax.lax.dot_general(
            x, g_ref[...], dn, preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            xg, bf_ref[...], dn, preferred_element_type=jnp.float32
        )
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)
        se = pltpu.bitcast(pltpu.repeat(sw_ref[0, q], reps, 0), jnp.bfloat16)
        xq = x[:, q * 2 * tw : (q + 1) * 2 * tw]
        if variant == "swrep_ro":
            be = pltpu.bitcast(pltpu.repeat(bw_ref[0, q], reps, 0), jnp.bfloat16)
            wd = wbf * se + be
            acc += jax.lax.dot_general(xq, wd, dn,
                                       preferred_element_type=jnp.float32)
        elif variant == "sub_ro":
            wd = (wbf - jnp.bfloat16(128.0)) * se
            acc += jax.lax.dot_general(xq, wd, dn,
                                       preferred_element_type=jnp.float32)
        else:  # f32w_ro
            wd = wbf.astype(jnp.float32) * se.astype(jnp.float32)
            acc += jax.lax.dot_general(xq.astype(jnp.float32), wd, dn,
                                       preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_mm(variant, tw=256, tn=512):
    gq = 2 * tw // GS

    @jax.jit
    def mm(x, words, sw, bw, bf32, g):
        m, k = x.shape
        kw, n = words.shape
        tm = max(8, min(256, -(-m // 8) * 8))
        mp = -(-m // tm) * tm
        if mp != m:
            x = jnp.pad(x, ((0, mp - m), (0, 0)))
        grid = (mp // tm, n // tn, kw // tw)
        gpt = 8 * tw // GS
        in_specs = [
            pl.BlockSpec((tm, 8 * tw), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, gq // 2, tn), lambda i, j, kk: (kk, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, gq // 2, tn), lambda i, j, kk: (kk, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * tw, gpt), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            functools.partial(_kern, reps=tw // (gq // 2), variant=variant),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * n * kw * 8,
                bytes_accessed=kw * n * 4 + mp * kw * 16 + mp * n * 2,
                transcendentals=0,
            ),
        )(x, words, sw, bw, bf32, g)
        return out[:m] if mp != m else out

    return mm


# ---- correctness -----------------------------------------------------------
rng = np.random.default_rng(0)
K, N, M = 2048, 512, 8
TW = 256
codes = rng.integers(0, 16, (K, N), np.uint8)
s_np = rng.uniform(0.001, 0.01, (K // 32, N)).astype(np.float32)
b_np = rng.uniform(-0.01, 0.0, (K // 32, N)).astype(np.float32)
bfold = (b_np - 128.0 * s_np).astype(np.float32)
x_np = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
wd_true = np.repeat(s_np, 32, 0) * codes.astype(np.float32) + np.repeat(b_np, 32, 0)
ref = x_np @ wd_true
# bf16 XLA-dequant precision reference
bf = lambda a: np.asarray(a, np.float32).astype(jnp.bfloat16).astype(np.float32)
ref_bf16 = bf(x_np) @ bf(wd_true)
emit(what="xla_bf16_rel_err",
     value=round(float(np.abs(ref_bf16 - ref).max() / np.abs(ref).max()), 5))

xp = jnp.asarray(x_np[:, x_perm(K, TW)], jnp.bfloat16)
words = jnp.asarray(pack_ro(codes, TW))
sw = jnp.asarray(pack_scale_words_ro(s_np, TW, K))
bw = jnp.asarray(pack_scale_words_ro(bfold, TW, K))
bf32 = jnp.asarray(b_np)  # [K/GS, N] f32 true bias plane
g_mat = jnp.asarray(gsum_matrix_ro(TW), jnp.bfloat16)

for variant in ("swrep_ro", "sub_ro", "f32w_ro"):
    mm = make_mm(variant)
    try:
        got = np.asarray(mm(xp, words, sw, bw, bf32, g_mat)).astype(np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        emit(what=f"{variant}_rel_err", value=round(float(err), 5))
    except Exception as e:  # noqa: BLE001
        emit(what=variant, error=str(e)[:300])

emit(what="correctness_done")

# ---- chain timing ----------------------------------------------------------
from bench import llama8b_cfg

cfg = llama8b_cfg()
B = 8
H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
QD = cfg.q_dim
key = jax.random.PRNGKey(0)


def rand_layer(key, k_dim, n_dim):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nt = k_dim // (8 * TW)
    gq = 2 * TW // GS
    return dict(
        words=jax.random.randint(k1, (L, k_dim // 8, n_dim), -(2**31),
                                 2**31 - 1, jnp.int32),
        sw=jax.random.randint(k2, (L, nt, 4, gq // 2, n_dim), -(2**31),
                              2**31 - 1, jnp.int32),
        bw=jax.random.randint(k3, (L, nt, 4, gq // 2, n_dim), -(2**31),
                              2**31 - 1, jnp.int32),
        bf32=jax.random.uniform(k4, (L, k_dim // GS, n_dim), jnp.float32,
                                -0.01, 0.0),
    )


keys = jax.random.split(key, 4)
layers = dict(
    wqkv=rand_layer(keys[0], H, QD + 2 * cfg.kv_dim),
    wo=rand_layer(keys[1], QD, H),
    wgateup=rand_layer(keys[2], H, 2 * I),
    down=rand_layer(keys[3], I, H),
)
g_mats = {k_dim: jnp.asarray(gsum_matrix_ro(TW), jnp.bfloat16)
          for k_dim in (H, QD, I)}


def chain_of(mm):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01

        def call(h, lw, k_dim):
            return mm(h, lw["words"], lw["sw"], lw["bw"], lw["bf32"],
                      g_mats[k_dim])

        def step(xx, _):
            def layer(hh, lw):
                qkv = call(hh, lw["wqkv"], H)
                q = qkv[..., :QD]
                ao = call(q, lw["wo"], QD)
                gu = call(ao, lw["wgateup"], H)
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return call(hid, lw["down"], I), None

            y, _ = jax.lax.scan(layer, xx, layers)
            return 0.999 * y, None

        y, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return y

    return chain


def slope_time(fn, args, n1=5, n2=25, reps=3):
    def run(nn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(nn, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    run(n1)
    run(n2)
    return (run(n2) - run(n1)) / (n2 - n1)


for variant in ("sub_ro", "f32w_ro", "swrep_ro"):
    mm = make_mm(variant)
    try:
        t0 = time.perf_counter()
        t = slope_time(chain_of(mm), (layers,))
        emit(what=f"{variant}_chain_ms", value=round(t * 1e3, 3),
             wall_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # noqa: BLE001
        emit(what=f"{variant}_chain", error=str(e)[:300])

emit(what="done")
