"""Bit-trick w4 kernel, round 2: BASE=0x4300 (bf16 128+c exact, 7-bit
mantissa), scale expansion via MXU dots instead of jnp.repeat.

Variants:
- edot:      se,be = E @ s, E @ b (E = [2tw, gq] 0/1 expansion), wd = wbf*se+be
- edot_xsum: se = E @ s only; bias folded via acc += (x @ S) @ b_tile where
             S is the per-group column-sum matrix (1 VPU mul/weight)
- floor:     unpack+dot only (reference lower bound)

Writes JSON lines to exp/bt2.out.
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

OUT = open("/root/repo/exp/bt2.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


BASE = 0x43004300  # bf16(128.0)|code in low-4 mantissa bits -> 128+c exact
MASK = 0x000F000F


def _ext(w, q):
    return ((w >> (4 * q)) & MASK) | BASE if q else (w & MASK) | BASE


def pack_bt(codes: np.ndarray, tw: int) -> np.ndarray:
    """codes [K, N] uint8 -> int32 words [K/8, N], lo_hi bitcast order.

    Within a k-tile of 8*tw codes: quarter q (nibble q and q+4) covers rows
    [q*2tw, (q+1)*2tw); word j's nibbles (q, q+4) hold rows (2j, 2j+1) of
    that quarter (probed: bitcast word row j -> bf16 rows 2j=lo,2j+1=hi).
    """
    k, n = codes.shape
    assert k % (8 * tw) == 0
    words = np.zeros((k // 8, n), np.uint32)
    n_tiles = k // (8 * tw)
    for t in range(n_tiles):
        tile = codes[t * 8 * tw : (t + 1) * 8 * tw]
        for nib in range(8):
            q, h = nib % 4, nib // 4
            rows = q * 2 * tw + 2 * np.arange(tw) + h
            words[t * tw : (t + 1) * tw] |= (
                tile[rows].astype(np.uint32) << (4 * nib)
            )
    return words.view(np.int32)


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
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)
        xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wbf, dn,
                                   preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _edot_kernel(x_ref, p_ref, s_ref, b_ref, e_ref, o_ref, acc_ref, *,
                 group_size):
    """se = E @ s per quarter (MXU), wd = wbf*se + be, 4 dots."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    gs = group_size
    gq = (2 * tw) // gs  # groups per quarter
    s = s_ref[...]  # [gpt, TN] bf16
    bb = b_ref[...]
    e = e_ref[...]  # [2*tw, gq] bf16 expansion matrix
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)  # [2tw, TN]
        sq = s[q * gq : (q + 1) * gq]
        bq = bb[q * gq : (q + 1) * gq]
        se = jax.lax.dot_general(e, sq, dn,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
        be = jax.lax.dot_general(e, bq, dn,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
        wd = wbf * se + be
        xq = x_ref[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wd, dn,
                                   preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _edx_kernel(x_ref, p_ref, s_ref, b_ref, e_ref, g_ref, o_ref, acc_ref, *,
                group_size):
    """se = E @ s (MXU); bias via xg = x @ G then xg @ b (MXU); 1 mul/wt."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[...]
    tw, tn = w.shape
    gs = group_size
    gq = (2 * tw) // gs
    s = s_ref[...]  # [gpt, TN]
    bb = b_ref[...]  # [gpt, TN] (folded: b - 128*s)
    e = e_ref[...]  # [2*tw, gq]
    g = g_ref[...]  # [8*tw, gpt] group-sum matrix
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    x = x_ref[...]
    # bias: acc += (x @ G) @ b   ([TM, gpt] @ [gpt, TN])
    xg = jax.lax.dot_general(x, g, dn, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
    acc += jax.lax.dot_general(xg, bb, dn,
                               preferred_element_type=jnp.float32)
    for q in range(4):
        wbf = pltpu.bitcast(_ext(w, q), jnp.bfloat16)
        sq = s[q * gq : (q + 1) * gq]
        se = jax.lax.dot_general(e, sq, dn,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
        wd = wbf * se
        xq = x[:, q * 2 * tw : (q + 1) * 2 * tw]
        acc += jax.lax.dot_general(xq, wd, dn,
                                   preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_mm(kernel_name, group_size=32, tw=256, tn=512):
    gs = group_size

    @jax.jit
    def mm(x, words, scale, bias):
        m, k = x.shape
        kw, n = words.shape
        tm = max(8, min(256, -(-m // 8) * 8))
        mp = -(-m // tm) * tm
        if mp != m:
            x = jnp.pad(x, ((0, mp - m), (0, 0)))
        grid = (mp // tm, n // tn, kw // tw)
        gpt = 8 * tw // gs
        gq = 2 * tw // gs
        specs = {
            "x": pl.BlockSpec((tm, 8 * tw), lambda i, j, kk: (i, kk),
                              memory_space=pltpu.VMEM),
            "p": pl.BlockSpec((tw, tn), lambda i, j, kk: (kk, j),
                              memory_space=pltpu.VMEM),
            "s": pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j),
                              memory_space=pltpu.VMEM),
            "e": pl.BlockSpec((2 * tw, gq), lambda i, j, kk: (0, 0),
                              memory_space=pltpu.VMEM),
            "g": pl.BlockSpec((8 * tw, gpt), lambda i, j, kk: (0, 0),
                              memory_space=pltpu.VMEM),
        }
        # expansion matrix: se[r] = s[r // gs]
        e_np = np.zeros((2 * tw, gq), np.float32)
        e_np[np.arange(2 * tw), np.arange(2 * tw) // gs] = 1.0
        e_arr = jnp.asarray(e_np, jnp.bfloat16)
        # group-sum matrix over the full 8*tw k-tile
        g_np = np.zeros((8 * tw, gpt), np.float32)
        g_np[np.arange(8 * tw), np.arange(8 * tw) // gs] = 1.0
        g_arr = jnp.asarray(g_np, jnp.bfloat16)

        if kernel_name == "floor":
            kern, in_specs, args = _floor_kernel, [specs["x"], specs["p"]], [
                x, words]
        elif kernel_name == "edot":
            kern = functools.partial(_edot_kernel, group_size=gs)
            in_specs = [specs["x"], specs["p"], specs["s"], specs["s"],
                        specs["e"]]
            args = [x, words, scale, bias, e_arr]
        else:  # edx
            kern = functools.partial(_edx_kernel, group_size=gs)
            in_specs = [specs["x"], specs["p"], specs["s"], specs["s"],
                        specs["e"], specs["g"]]
            args = [x, words, scale, bias, e_arr, g_arr]

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


# ---- correctness -----------------------------------------------------------
rng = np.random.default_rng(0)
K, N, M = 2048, 512, 8
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
words = jnp.asarray(pack_bt(codes, 256))
s_bf = jnp.asarray(s_np, jnp.bfloat16)
bf_bf = jnp.asarray(bfold, jnp.bfloat16)

# numpy roundtrip sanity of 128+c trick
probe_w = np.asarray(pack_bt(codes, 256))
for name in ("edot", "edx"):
    mm = make_mm(name)
    try:
        got = np.asarray(mm(x, words, s_bf, bf_bf)).astype(np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        emit(what=f"{name}_rel_err", value=round(float(err), 5))
    except Exception as e:  # noqa: BLE001
        emit(what=name, error=str(e)[:300])

emit(what="correctness_done")

# ---- chain timing on llama8b geometry --------------------------------------
from bench import llama8b_cfg

cfg = llama8b_cfg()
B = 8
H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
QD = cfg.q_dim
key = jax.random.PRNGKey(0)


def rand_layer(key, k_dim, n_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return dict(
        words=jax.random.randint(k1, (L, k_dim // 8, n_dim), -(2**31),
                                 2**31 - 1, jnp.int32),
        scale=jax.random.uniform(k2, (L, k_dim // 32, n_dim), jnp.bfloat16,
                                 0.001, 0.01),
        bias=jax.random.uniform(k3, (L, k_dim // 32, n_dim), jnp.bfloat16,
                                -1.29, -1.28),
    )


keys = jax.random.split(key, 4)
layers = dict(
    wqkv=rand_layer(keys[0], H, QD + 2 * cfg.kv_dim),
    wo=rand_layer(keys[1], QD, H),
    wgateup=rand_layer(keys[2], H, 2 * I),
    down=rand_layer(keys[3], I, H),
)


def chain_of(mm):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01

        def step(xx, _):
            def layer(hh, lw):
                qkv = mm(hh, lw["wqkv"]["words"], lw["wqkv"]["scale"],
                         lw["wqkv"]["bias"])
                q = qkv[..., :QD]
                ao = mm(q, lw["wo"]["words"], lw["wo"]["scale"],
                        lw["wo"]["bias"])
                gu = mm(ao, lw["wgateup"]["words"], lw["wgateup"]["scale"],
                        lw["wgateup"]["bias"])
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return mm(hid, lw["down"]["words"], lw["down"]["scale"],
                          lw["down"]["bias"]), None

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


for name in ("edx", "edot"):
    mm = make_mm(name)
    try:
        t0 = time.perf_counter()
        t = slope_time(chain_of(mm), (layers,))
        emit(what=f"{name}_chain_ms", value=round(t * 1e3, 3),
             wall_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # noqa: BLE001
        emit(what=f"{name}_chain", error=str(e)[:300])

# prefill 512 for the winner
mm = make_mm("edx")


def prefill_chain(mm, m):
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((m, H), jnp.bfloat16) * 0.01

        def step(xx, _):
            def layer(hh, lw):
                qkv = mm(hh, lw["wqkv"]["words"], lw["wqkv"]["scale"],
                         lw["wqkv"]["bias"])
                q = qkv[..., :QD]
                ao = mm(q, lw["wo"]["words"], lw["wo"]["scale"],
                        lw["wo"]["bias"])
                gu = mm(ao, lw["wgateup"]["words"], lw["wgateup"]["scale"],
                        lw["wgateup"]["bias"])
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return mm(hid, lw["down"]["words"], lw["down"]["scale"],
                          lw["down"]["bias"]), None

            y, _ = jax.lax.scan(layer, xx, layers)
            return 0.999 * y, None

        y, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return y

    return chain


try:
    t = slope_time(prefill_chain(mm, 512), (layers,), n1=2, n2=8)
    emit(what="edx_prefill512_ms", value=round(t * 1e3, 3))
except Exception as e:  # noqa: BLE001
    emit(what="edx_prefill512", error=str(e)[:300])

emit(what="done")
