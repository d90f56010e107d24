"""Probe pltpu.bitcast int32 -> bf16 row mapping + time bt-kernel variants:
- floor: ext+bitcast+dot only (no scales) — true unpack cost
- xt32: per-group dots with scales applied on the accumulator (gs=32 exact)
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

OUT = open("/root/repo/exp/bt_probe.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


# ---- probe: which bf16 rows does word s produce? ---------------------------


def _probe_kernel(i_ref, o_ref):
    o_ref[...] = pltpu.bitcast(i_ref[...], jnp.bfloat16)


def probe():
    # word s = bf16bits(100+2s) | bf16bits(100+2s+1)<<16
    def b16(v):
        return int(np.asarray(v, jnp.bfloat16).view(np.uint16))

    words = np.zeros((8, 128), np.uint32)
    for s in range(8):
        words[s, :] = b16(100 + 2 * s) | (b16(100 + 2 * s + 1) << 16)
    out = pl.pallas_call(
        _probe_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
    )(jnp.asarray(words.view(np.int32)))
    col0 = np.asarray(out)[:, 0].astype(np.float32)
    emit(what="bitcast_rows", rows=[float(v) for v in col0])


probe()

# ---- kernels ---------------------------------------------------------------

BASE = 0x43804380
MASK = 0x000F000F


def _ext(w, q):
    return ((w >> (4 * q)) & MASK) | BASE if q else (w & MASK) | BASE


def _floor_kernel(x_ref, p_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)  # [2*tw, TN]
        xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wbf, dn,
                                   preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _xt32_kernel(x_ref, p_ref, s_ref, b_ref, o_ref, acc_ref, *, group_size):
    """Scales applied per group on the accumulator:
    acc += (x_g @ wbf_g) * s_g + sum(x_g) * b'_g   (b' = b - 256*s)
    x transposed once per tile so group slices are sublane-aligned."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]  # [TW, TN] int32
    tw, tn = w.shape
    tm = x_ref.shape[0]
    gs = group_size
    xt = x_ref[...].T  # [8*TW, TM] one small relayout
    s = s_ref[...]  # [gpt, TN] f32
    bb = b_ref[...]
    acc = acc_ref[...]
    gq = (2 * tw) // gs  # groups per quarter
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)  # [2*tw, TN]
        for gl in range(gq):
            g = q * gq + gl
            wg = wbf[gl * gs : (gl + 1) * gs]  # [gs, TN]
            xg = xt[q * 2 * tw + gl * gs : q * 2 * tw + (gl + 1) * gs]  # [gs, TM]
            pg = jax.lax.dot_general(
                xg, wg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TM, TN]
            xs = jnp.sum(xg.astype(jnp.float32), axis=0)[:, None]  # [TM, 1]
            acc += pg * s[g][None, :] + xs * bb[g][None, :]
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _mk(kernel, with_scales, group_size=32, tw=256, tn=512):
    @functools.partial(jax.jit, static_argnames=())
    def mm(x, words, scale, bias):
        m, k = x.shape
        kw, n = words.shape
        tm = max(16, min(256, -(-m // 16) * 16))
        mp = -(-m // tm) * tm
        if mp != m:
            x = jnp.pad(x, ((0, mp - m), (0, 0)))
        grid = (mp // tm, n // tn, kw // tw)
        gpt = 8 * tw // group_size
        in_specs = [
            pl.BlockSpec((tm, 8 * tw), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ]
        args = [x, words]
        if with_scales:
            in_specs += [
                pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ]
            args += [scale, bias]
            kern = functools.partial(kernel, group_size=group_size)
        else:
            kern = kernel
        out = pl.pallas_call(
            kern,
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
        )(*args)
        return out[:m] if mp != m else out

    return mm


# pack according to probed mapping — candidate generated for BOTH mappings,
# correctness decided on-device
def pack_bt(codes, tw, interleave):
    """interleave: bf16 row r of bitcast(word_col) = ?
    'lo_hi': rows (2s, 2s+1) = (low16, high16) of word s
    'half':  rows (s, s+S)  = deinterleaved halves
    """
    k, n = codes.shape
    words = np.zeros((k // 8, n), np.uint32)
    n_tiles = k // (8 * tw)
    for t in range(n_tiles):
        tile = codes[t * 8 * tw : (t + 1) * 8 * tw]
        for nib in range(8):
            q, h = nib % 4, nib // 4
            for j in range(tw):
                if interleave == "lo_hi":
                    r = 2 * j + h  # within quarter q
                else:
                    r = j + h * tw
                kpos = q * 2 * tw + r
                words[t * tw + j] |= tile[kpos].astype(np.uint32) << (4 * nib)
    return words.view(np.int32)


rng = np.random.default_rng(0)
K, N, M = 2048, 512, 8
codes = rng.integers(0, 16, (K, N), np.uint8)
s_np = rng.uniform(0.001, 0.01, (K // 32, N)).astype(np.float32)
b_np = rng.uniform(-0.01, 0.0, (K // 32, N)).astype(np.float32)
bfold = (b_np - 256.0 * s_np).astype(np.float32)
x_np = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
ref = x_np @ (
    np.repeat(s_np, 32, axis=0) * codes.astype(np.float32)
    + np.repeat(b_np, 32, axis=0)
)
x = jnp.asarray(x_np, jnp.bfloat16)

mm_xt32 = _mk(_xt32_kernel, True)
for inter in ("lo_hi", "half"):
    words = jnp.asarray(pack_bt(codes, 256, inter))
    try:
        got = np.asarray(mm_xt32(x, words, jnp.asarray(s_np), jnp.asarray(bfold)))
        err = np.abs(got.astype(np.float32) - ref).max() / np.abs(ref).max()
        emit(what=f"xt32_{inter}_rel_err", value=round(float(err), 5))
    except Exception as e:  # noqa: BLE001
        emit(what=f"xt32_{inter}", error=str(e)[:300])

# ---- chain timing ----------------------------------------------------------
from bench import llama8b_cfg

cfg = llama8b_cfg()
B = 8
H, I = cfg.hidden_size, cfg.intermediate_size
QD = cfg.q_dim
L = cfg.num_layers
key = jax.random.PRNGKey(0)


def rand_layer(key, k_dim, n_dim, plane_dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return dict(
        words=jax.random.randint(k1, (L, k_dim // 8, n_dim), -(2**31),
                                 2**31 - 1, jnp.int32),
        scale=jax.random.uniform(k2, (L, k_dim // 32, n_dim), plane_dtype,
                                 0.001, 0.01),
        bias=jax.random.uniform(k3, (L, k_dim // 32, n_dim), plane_dtype,
                                -2.57, -2.55),
    )


keys = jax.random.split(key, 4)
layers = dict(
    wqkv=rand_layer(keys[0], H, QD + 2 * cfg.kv_dim),
    wo=rand_layer(keys[1], QD, H),
    wgateup=rand_layer(keys[2], H, 2 * I),
    down=rand_layer(keys[3], I, H),
)


def chain_of(mm, with_scales):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01

        def call(h, lw):
            if with_scales:
                return mm(h, lw["words"], lw["scale"], lw["bias"])
            return mm(h, lw["words"], None, None)

        def step(xx, _):
            def layer(hh, lw):
                qkv = call(hh, lw["wqkv"])
                q = qkv[..., :QD]
                ao = call(q, lw["wo"])
                gu = call(ao, lw["wgateup"])
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return call(hid, lw["down"]), None

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


mm_floor = _mk(_floor_kernel, False)
try:
    t = slope_time(chain_of(mm_floor, False), (layers,))
    emit(what="bt_floor_chain_ms", value=round(t * 1e3, 3))
except Exception as e:  # noqa: BLE001
    emit(what="bt_floor_chain", error=str(e)[:300])

try:
    t0 = time.perf_counter()
    t = slope_time(chain_of(mm_xt32, True), (layers,))
    emit(what="xt32_chain_ms", value=round(t * 1e3, 3),
         total_wall_s=round(time.perf_counter() - t0, 1))
except Exception as e:  # noqa: BLE001
    emit(what="xt32_chain", error=str(e)[:300])

emit(what="done")
