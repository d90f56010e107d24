"""Bit-trick w4, round 3: diagnose the elementwise-on-bitcast cost and try
layout-matched scale operands.

Variants (all on top of the 0x4300 = 128+c trick):
- scalarmul: wd = wbf * 2.0 + 1.0     -- layout-preserving scalar ops cost
- swrep:     se/be built by bitcasting REPEATED PACKED int32 scale words
             (jnp.repeat on int32 [gq, tn] -> [tw, tn], then bitcast ->
             [2tw, tn] bf16 with the same layout as wbf); wd = wbf*se + be
- swrep_ro:  same but pack order remapped so the repeat is pltpu.repeat
             (tiled copy) instead of interleaved jnp.repeat; x permuted
             outside the kernel to match.

Writes JSON lines to exp/bt3.out.
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

OUT = open("/root/repo/exp/bt3.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


BASE = 0x43004300
MASK = 0x000F000F
GS = 32


def _ext(w, q):
    return ((w >> (4 * q)) & MASK) | BASE if q else (w & MASK) | BASE


def pack_nat(codes, tw):
    """natural order: quarter q rows (2j, 2j+1) = word j nibbles (q, q+4)."""
    k, n = codes.shape
    words = np.zeros((k // 8, n), np.uint32)
    for t in range(k // (8 * tw)):
        tile = codes[t * 8 * tw : (t + 1) * 8 * tw]
        for nib in range(8):
            q, h = nib % 4, nib // 4
            rows = q * 2 * tw + 2 * np.arange(tw) + h
            words[t * tw : (t + 1) * tw] |= tile[rows].astype(np.uint32) << (4 * nib)
    return words.view(np.int32)


def quarter_perm(tw):
    """reordered: bf16 row r of a quarter holds original row perm[r] where
    group-of-row cycles mod gq (so scale words tile with period gq/2)."""
    gq = 2 * tw // GS
    r = np.arange(2 * tw)
    return (r % gq) * GS + r // gq  # [2tw] original row index


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
    """column permutation applied to x so pack_ro dots line up."""
    perm = quarter_perm(tw)
    cols = np.zeros((k,), np.int64)
    for t in range(k // (8 * tw)):
        for q in range(4):
            base = t * 8 * tw + q * 2 * tw
            cols[base : base + 2 * tw] = base + perm
    return cols


def b16(v):
    return np.asarray(v, np.float32).astype(jnp.bfloat16).view(np.uint16)


def pack_scale_words_nat(plane):
    """plane [K/GS, N] f32 -> int32 [K/8, N]: word j holds bf16 bits of the
    expanded plane rows (2j, 2j+1) (same group; both halves equal)."""
    g, n = plane.shape
    bits = b16(plane).astype(np.uint32)
    w = bits | (bits << 16)  # [G, N]
    return np.repeat(w, GS // 2, axis=0).view(np.int32)  # [K/8? -> G*16, N]


def pack_scale_words_ro(plane, tw):
    """for pack_ro: per quarter the word rows cycle groups with period gq/2;
    emit only one period [gq/2, N] per quarter (kernel tiles it)."""
    gtot, n = plane.shape  # K/GS
    gq = 2 * tw // GS
    k = gtot * GS
    out = []
    perm = quarter_perm(tw)
    for t in range(k // (8 * tw)):
        for q in range(4):
            g0 = (t * 8 * tw + q * 2 * tw) // GS
            rows = []
            for j in range(gq // 2):
                glo = g0 + perm[2 * j] // GS
                ghi = g0 + perm[2 * j + 1] // GS
                lo = b16(plane[glo]).astype(np.uint32)
                hi = b16(plane[ghi]).astype(np.uint32)
                rows.append(lo | (hi << 16))
            out.append(np.stack(rows))
    return np.concatenate(out).view(np.int32)  # [ntiles*4*gq/2, N]


def _scalarmul_kernel(x_ref, p_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)
        wd = wbf * jnp.bfloat16(2.0) + jnp.bfloat16(1.0)
        xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wd, dn, preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _swrep_kernel(x_ref, p_ref, sw_ref, bw_ref, o_ref, acc_ref):
    """sw/bw: [TW, TN] int32 packed scale/bias words (pre-expanded rows,
    natural order) — bitcast to bf16 [2TW, TN], same layout as wbf."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)
        se = pltpu.bitcast(sw_ref[:, q], jnp.bfloat16)  # [2tw? see spec]
        be = pltpu.bitcast(bw_ref[:, q], jnp.bfloat16)
        wd = wbf * se + be
        xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wd, dn, preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _swrep_ro_kernel(x_ref, p_ref, sw_ref, bw_ref, o_ref, acc_ref, *, reps):
    """sw/bw: [4, gq/2, TN] int32 one period per quarter; tiled via
    pltpu.repeat to [TW, TN], bitcast -> [2TW, TN]."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)
        sw = pltpu.repeat(sw_ref[0, q], reps, 0)  # [TW, TN] int32
        bw = pltpu.repeat(bw_ref[0, q], reps, 0)
        se = pltpu.bitcast(sw, jnp.bfloat16)
        be = pltpu.bitcast(bw, jnp.bfloat16)
        wd = wbf * se + be
        xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wd, dn, preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_mm(kernel_name, tw=256, tn=512):
    gq = 2 * tw // GS

    @jax.jit
    def mm(x, words, sw, bw):
        m, k = x.shape
        kw, n = words.shape
        tm = max(8, min(256, -(-m // 8) * 8))
        mp = -(-m // tm) * tm
        if mp != m:
            x = jnp.pad(x, ((0, mp - m), (0, 0)))
        grid = (mp // tm, n // tn, kw // tw)
        xspec = pl.BlockSpec((tm, 8 * tw), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM)
        pspec = pl.BlockSpec((tw, tn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                             memory_space=pltpu.VMEM)
        if kernel_name == "scalarmul":
            kern, in_specs, args = _scalarmul_kernel, [xspec, pspec], [x, words]
        elif kernel_name == "swrep":
            # sw/bw [K/8, 4?, N] -> stored [K/8, N] like words but indexed by
            # quarter: we store as [KW, 4, TN-chunks]? simpler: [KW4 = kw, n]
            # with quarter-major rows inside each k-tile:
            # sw argument here: [kw, 4, n//?]... use [4*kw? ] -> we pass
            # sw shaped [kw, 4n? ] NO — pass [kw*4? ].
            swspec = pl.BlockSpec((tw, 4, tn), lambda i, j, kk: (kk, 0, j),
                                  memory_space=pltpu.VMEM)
            kern = _swrep_kernel
            in_specs = [xspec, pspec, swspec, swspec]
            args = [x, words, sw, bw]
        else:  # swrep_ro
            swspec = pl.BlockSpec(
                (1, 4, gq // 2, tn), lambda i, j, kk: (kk, 0, 0, j),
                memory_space=pltpu.VMEM,
            )
            kern = functools.partial(_swrep_ro_kernel, reps=tw // (gq // 2))
            in_specs = [xspec, pspec, swspec, swspec]
            args = [x, words, sw, bw]
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=ospec,
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


# kernels above need sw shaped per-spec; build host-side helpers
def sw_nat(plane, tw, k):
    """-> [K/8, 4, N]: k-tile t, word-row j, quarter q."""
    g, n = plane.shape
    w = pack_scale_words_nat(plane).view(np.uint32)  # [K/8? = g*16, N]
    # rows of w are word rows in EXPANDED row order (2 rows per word over the
    # whole K): word j covers expanded rows (2j, 2j+1) globally. Regroup into
    # quarters of each 8*tw k-tile: quarter q covers k rows
    # [t*8tw + q*2tw, ...+2tw) -> word rows [ (t*8tw + q*2tw)/2, +tw )
    kw = k // 8
    out = np.zeros((kw, 4, n), np.uint32)
    for t in range(k // (8 * tw)):
        for q in range(4):
            r0 = (t * 8 * tw + q * 2 * tw) // 2
            out[t * tw : (t + 1) * tw, q] = w[r0 : r0 + tw]
    return out.view(np.int32)


def sw_ro(plane, tw, k):
    gq = 2 * tw // GS
    w = pack_scale_words_ro(plane, tw).view(np.uint32)  # [ntiles*4*gq/2, N]
    n = w.shape[1]
    nt = k // (8 * tw)
    return w.reshape(nt, 4, gq // 2, n).view(np.int32)


# ---- correctness -----------------------------------------------------------
rng = np.random.default_rng(0)
K, N, M = 2048, 512, 8
TW = 256
codes = rng.integers(0, 16, (K, N), np.uint8)
s_np = rng.uniform(0.001, 0.01, (K // 32, N)).astype(np.float32)
b_np = rng.uniform(-0.01, 0.0, (K // 32, N)).astype(np.float32)
bfold = (b_np - 128.0 * s_np).astype(np.float32)
x_np = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
ref = x_np @ (
    np.repeat(s_np, 32, axis=0) * codes.astype(np.float32)
    + np.repeat(b_np, 32, axis=0)
)
x = jnp.asarray(x_np, jnp.bfloat16)

mm = make_mm("swrep")
try:
    got = np.asarray(
        mm(x, jnp.asarray(pack_nat(codes, TW)),
           jnp.asarray(sw_nat(s_np, TW, K)), jnp.asarray(sw_nat(bfold, TW, K)))
    ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    emit(what="swrep_rel_err", value=round(float(err), 5))
except Exception as e:  # noqa: BLE001
    emit(what="swrep", error=str(e)[:300])

mm = make_mm("swrep_ro")
try:
    xp = jnp.asarray(x_np[:, x_perm(K, TW)], jnp.bfloat16)
    got = np.asarray(
        mm(xp, jnp.asarray(pack_ro(codes, TW)),
           jnp.asarray(sw_ro(s_np, TW, K)), jnp.asarray(sw_ro(bfold, TW, K)))
    ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    emit(what="swrep_ro_rel_err", value=round(float(err), 5))
except Exception as e:  # noqa: BLE001
    emit(what="swrep_ro", error=str(e)[:300])

emit(what="correctness_done")

# ---- chain timing ----------------------------------------------------------
from bench import llama8b_cfg

cfg = llama8b_cfg()
B = 8
H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
QD = cfg.q_dim
key = jax.random.PRNGKey(0)


def rand_layer(key, k_dim, n_dim, kind):
    k1, k2, k3 = jax.random.split(key, 3)
    words = jax.random.randint(k1, (L, k_dim // 8, n_dim), -(2**31),
                               2**31 - 1, jnp.int32)
    if kind == "scalarmul":
        return dict(words=words, sw=None, bw=None)
    if kind == "swrep":
        shp = (L, k_dim // 8, 4, n_dim)
    else:
        gq = 2 * 256 // GS
        shp = (L, k_dim // (8 * 256), 4, gq // 2, n_dim)
    return dict(
        words=words,
        sw=jax.random.randint(k2, shp, -(2**31), 2**31 - 1, jnp.int32),
        bw=jax.random.randint(k3, shp, -(2**31), 2**31 - 1, jnp.int32),
    )


def chain_of(mm, kind):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01

        def call(h, lw):
            if kind == "scalarmul":
                return mm(h, lw["words"], None, None)
            return mm(h, lw["words"], lw["sw"], lw["bw"])

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


# scalarmul variant needs a wrapper that ignores sw/bw=None
for kind in ("scalarmul", "swrep", "swrep_ro"):
    mmk = make_mm(kind)
    keys = jax.random.split(key, 4)
    layers = dict(
        wqkv=rand_layer(keys[0], H, QD + 2 * cfg.kv_dim, kind),
        wo=rand_layer(keys[1], QD, H, kind),
        wgateup=rand_layer(keys[2], H, 2 * I, kind),
        down=rand_layer(keys[3], I, H, kind),
    )
    try:
        t0 = time.perf_counter()
        t = slope_time(chain_of(mmk, kind), (layers,))
        emit(what=f"{kind}_chain_ms", value=round(t * 1e3, 3),
             wall_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # noqa: BLE001
        emit(what=f"{kind}_chain", error=str(e)[:300])

emit(what="done")
