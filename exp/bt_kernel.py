"""Bit-trick w4 dequant-matmul: build bf16 bit patterns (256+code) directly
with integer ops on packed int32 words — ~2 VPU lane-ops/weight vs ~6-7 for
the mask/convert/scale chain (floor-measured 12ms vs 5.3ms roofline).

Storage: int32 words [K/8, N]; nibble n of word j holds code for
k = 2*((n%4)*TW + j) + h where h depends on the hardware bitcast half order
(probed as candidates A/B). Scale stays a plane [K/gs, N]; bias plane is
pre-folded b' = b - 256*s.

Kernel: ext(q) = ((w >> 4q) & 0x000F000F) | 0x43804380 ; concat 4 quarters;
bitcast to bf16 [8*TW, TN]; mul/add expanded planes; one MXU dot.

Variants: btcat (concat+1 dot), bt4dot (4 dots, no concat).
Writes JSON lines to exp/bt_kernel.out.
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

OUT = open("/root/repo/exp/bt_kernel.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def _cdiv(a, b):
    return -(-a // b)


BASE = 0x43804380  # bf16(256.0) in both halves; mantissa low 4 bits = code
MASK = 0x000F000F


def pack_bt(codes: np.ndarray, tw: int, half_order: int) -> np.ndarray:
    """codes [K, N] uint8 (0..15) -> int32 words [K/8, N].

    Tile = tw words (8*tw codes). nibble n (0..7) of word j holds
    code[tile_base + 2*((n%4)*tw + j) + h], h = n//4 (order A) or 1-n//4 (B).
    """
    k, n = codes.shape
    assert k % (8 * tw) == 0
    words = np.zeros((k // 8, n), np.uint32)
    n_tiles = k // (8 * tw)
    for t in range(n_tiles):
        tile = codes[t * 8 * tw : (t + 1) * 8 * tw]  # [8*tw, N]
        for nib in range(8):
            q, h = nib % 4, nib // 4
            if half_order == 1:
                h = 1 - h
            rows = 2 * (q * tw + np.arange(tw)) + h
            vals = tile[rows].astype(np.uint32)  # [tw, N]
            words[t * tw : (t + 1) * tw] |= vals << (4 * nib)
    return words.view(np.int32)


def _bt_kernel(x_ref, p_ref, s_ref, b_ref, o_ref, acc_ref, *, group_size,
               variant):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]  # [TW, TN] int32
    tw, tn = w.shape
    s = s_ref[...].astype(jnp.bfloat16)  # [gpt, TN]
    bb = b_ref[...].astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def ext(q):
        return ((w >> (4 * q)) & MASK) | BASE if q else (w & MASK) | BASE

    if variant == "cat":
        o = jnp.concatenate([ext(0), ext(1), ext(2), ext(3)], axis=0)
        wbf = pltpu.bitcast(o, jnp.bfloat16)  # [8*tw, TN]
        gs = group_size
        se = jnp.repeat(s, gs, axis=0)
        be = jnp.repeat(bb, gs, axis=0)
        wd = wbf * se + be
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], wd, dn, preferred_element_type=jnp.float32
        )
    else:  # 4dot
        gs = group_size
        gq = (2 * tw) // gs  # groups per quarter
        acc = acc_ref[...]
        for q in range(4):
            wbf = pltpu.bitcast(ext(q), jnp.bfloat16)  # [2*tw, TN]
            se = jnp.repeat(s[q * gq : (q + 1) * gq], gs, axis=0)
            be = jnp.repeat(bb[q * gq : (q + 1) * gq], gs, axis=0)
            wd = wbf * se + be
            xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
            acc += jax.lax.dot_general(
                xq, wd, dn, preferred_element_type=jnp.float32
            )
        acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "tw", "tn", "variant"))
def bt_matmul(x, words, scale, bias, *, group_size=32, tw=256, tn=512,
              variant="cat"):
    """x [M, K] bf16 @ dequant(words [K/8, N]) -> [M, N] bf16."""
    m, k = x.shape
    kw, n = words.shape
    assert kw * 8 == k
    tm = max(16, min(256, -(-m // 16) * 16))
    mp = _cdiv(m, tm) * tm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, n // tn, kw // tw)
    gpt = 8 * tw // group_size

    out = pl.pallas_call(
        functools.partial(_bt_kernel, group_size=group_size, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 8 * tw), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=kw * n * 4 + 2 * scale.size * 4 + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
    )(x, words, scale, bias)
    return out[:m] if mp != m else out


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


# ---- correctness: which half order does the hardware bitcast use? ---------
rng = np.random.default_rng(0)
K, N, M = 2048, 512, 8
codes = rng.integers(0, 16, (K, N), np.uint8)
s_np = rng.uniform(0.001, 0.01, (K // 32, N)).astype(np.float32)
b_np = rng.uniform(-0.01, 0.0, (K // 32, N)).astype(np.float32)
bfold = (b_np - 256.0 * s_np).astype(np.float32)
x_np = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)

w_dense = (
    np.repeat(s_np, 32, axis=0) * codes.astype(np.float32)
    + np.repeat(b_np, 32, axis=0)
)
ref = x_np @ w_dense

x = jnp.asarray(x_np, jnp.bfloat16)
s = jnp.asarray(s_np)
bf = jnp.asarray(bfold)

for order in (0, 1):
    words = jnp.asarray(pack_bt(codes, 256, order))
    for variant in ("cat", "4dot"):
        try:
            got = np.asarray(
                bt_matmul(x, words, s, bf, variant=variant)
            ).astype(np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            emit(what=f"bt_{variant}_order{order}_rel_err", value=round(float(err), 5))
        except Exception as e:  # noqa: BLE001
            emit(what=f"bt_{variant}_order{order}", error=str(e)[:300])

emit(what="correctness_done")

# ---- chain timing on bench geometry ---------------------------------------
from bench import llama8b_cfg

cfg = llama8b_cfg()
B = 8
H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
QD = cfg.q_dim  # 4096

key = jax.random.PRNGKey(0)


def rand_layer(key, k_dim, n_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return dict(
        words=jax.random.randint(k1, (L, k_dim // 8, n_dim), -(2**31), 2**31 - 1, jnp.int32),
        scale=jax.random.uniform(k2, (L, k_dim // 32, n_dim), jnp.float32, 0.001, 0.01),
        bias=jax.random.uniform(k3, (L, k_dim // 32, n_dim), jnp.float32, -2.57, -2.55),
    )


keys = jax.random.split(key, 4)
layers = dict(
    wqkv=rand_layer(keys[0], H, QD + 2 * cfg.kv_dim),
    wo=rand_layer(keys[1], QD, H),
    wgateup=rand_layer(keys[2], H, 2 * I),
    down=rand_layer(keys[3], I, H),
)


def layer_chain(variant):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01

        def mm(h, lw):
            return bt_matmul(h, lw["words"], lw["scale"], lw["bias"],
                             variant=variant)

        def step(xx, _):
            def layer(hh, lw):
                qkv = mm(hh, lw["wqkv"])
                q = qkv[..., :QD]
                ao = mm(q, lw["wo"])
                gu = mm(ao, lw["wgateup"])
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return mm(hid, lw["down"]), None

            y, _ = jax.lax.scan(layer, xx, layers)
            return 0.999 * y, None

        y, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return y

    return chain


for variant in ("cat", "4dot"):
    try:
        t = slope_time(layer_chain(variant), (layers,))
        emit(what=f"bt_{variant}_chain_ms", value=round(t * 1e3, 3))
    except Exception as e:  # noqa: BLE001
        emit(what=f"bt_{variant}_chain", error=str(e)[:300])

# prefill shape: M=512 through one layer set, per-step time
def prefill_chain(variant, m):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((m, H), jnp.bfloat16) * 0.01

        def mm(h, lw):
            return bt_matmul(h, lw["words"], lw["scale"], lw["bias"],
                             variant=variant)

        def step(xx, _):
            def layer(hh, lw):
                qkv = mm(hh, lw["wqkv"])
                q = qkv[..., :QD]
                ao = mm(q, lw["wo"])
                gu = mm(ao, lw["wgateup"])
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return mm(hid, lw["down"]), None

            y, _ = jax.lax.scan(layer, xx, layers)
            return 0.999 * y, None

        y, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return y

    return chain


try:
    t = slope_time(prefill_chain("cat", 512), (layers,), n1=2, n2=8)
    emit(what="bt_cat_prefill512_ms", value=round(t * 1e3, 3))
except Exception as e:  # noqa: BLE001
    emit(what="bt_cat_prefill512", error=str(e)[:300])

emit(what="done")
