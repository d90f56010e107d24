"""Two-level (sub-scale) w4 kernel prototype, slope-timed on the llama3-8b
stacked decode chain (M=8, 32 layers, scalar-prefetch layer indexing — the
REAL hot path, no scan xs copies).

Layout under test (bit-exact Q4_K): codes u8 packed [L, Kst, N] as today,
PLUS sc/mc u8 sub-scale codes [L, G, N] and d/dm f32 supers [L, G/SB, N]
(SB = groups per superblock = 8 for Q4_K's 256/32). In-kernel:
    s  = repeat(d, SB) * sc            # [gpt, TN], exact in f32
    w  = codes * repeat(s, gs)         # [TK, TN]
    acc += x @ w + (x @ E) @ (repeat(dm, SB) * mc)   # min term on the MXU
Bytes/weight: 0.5 + 2/32 + 8/256 = 0.594 vs the current f32-plane 0.75.

Variants timed on the full stacked chain:
  A_cur       current _w4_matmul_l with f32 planes (baseline)
  B_bf16      current _w4_matmul_l with bf16 planes (halved plane bytes)
  C_sub       two-level kernel, f32 supers (bit-exact)
Floors printed for each layout.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

import signal

from bench import llama8b_cfg, build_weights

signal.alarm(0)  # cancel bench.py's import-time relay watchdog
from mistralrs_tpu.quant.qtensor import QTensor
import importlib

qmm = importlib.import_module("mistralrs_tpu.ops.quant_matmul")

OUT = open("/root/repo/exp/subscale_kernel.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


SB = 8  # groups per superblock (256/32)
TN, TK = 1024, 2048


# ---- two-level stacked kernel ----------------------------------------------


def _w4sub_l_kernel(
    l_ref, x_lo_ref, x_hi_ref, p_ref, sc_lo_ref, sc_hi_ref, d_lo_ref,
    d_hi_ref, mc_lo_ref, mc_hi_ref, dm_lo_ref, dm_hi_ref, o_ref, acc_ref,
    *, group_size,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0].astype(jnp.int32) & 0xFF
    dn = (((1,), (0,)), ((), ()))

    def half(x_ref, codes, sc_ref, d_ref, mc_ref, dm_ref):
        tk = codes.shape[0]
        tn = codes.shape[1]
        gpt = tk // group_size
        # s_small [gpt, TN] = repeat(d, SB) * sc  (exact f32)
        d = jnp.repeat(d_ref[0, 0], SB, axis=0)  # [gpt, TN] f32
        s_small = d * sc_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
        s = jnp.repeat(s_small, group_size, axis=0)  # [TK, TN]
        w = codes.astype(jnp.float32) * s
        x = x_ref[...].astype(jnp.float32)
        acc = jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.float32)
        # min term: xs = x @ E (group sums on the MXU), then xs @ b_small
        rows = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 1)
        e = (rows // group_size == cols).astype(jnp.float32)
        xs = jax.lax.dot_general(x, e, dn, preferred_element_type=jnp.float32)
        dm = jnp.repeat(dm_ref[0, 0], SB, axis=0)
        b_small = dm * mc_ref[0, 0].astype(jnp.int32).astype(jnp.float32)  # [gpt, TN]
        acc += jax.lax.dot_general(
            xs, b_small, dn, preferred_element_type=jnp.float32
        )
        return acc

    acc_ref[...] += half(x_lo_ref, p & 15, sc_lo_ref, d_lo_ref,
                         mc_lo_ref, dm_lo_ref)
    acc_ref[...] += half(x_hi_ref, p >> 4, sc_hi_ref, d_hi_ref,
                         mc_hi_ref, dm_hi_ref)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4sub_matmul_l(x, packed, sc, d, mc, dm, layer, *, group_size):
    """packed [L,Kst,N] u8; sc/mc [L,G,N] u8; d/dm [L,G/SB,N] f32."""
    m, k = x.shape
    nl, k2, n = packed.shape
    tm = min(_round_up(m, 16), 256)
    tn, tk = TN, TK
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k2 // tk)
    gpt = tk // group_size
    spt = gpt // SB
    khalf = k2 // tk
    g2 = sc.shape[1] // 2
    sp2 = d.shape[1] // 2

    sc4 = sc.reshape(nl, 2, g2, n)
    mc4 = mc.reshape(nl, 2, g2, n)
    d4 = d.reshape(nl, 2, sp2, n)
    dm4 = dm.reshape(nl, 2, sp2, n)

    def c_spec(which):
        return pl.BlockSpec((1, 1, gpt, tn), lambda i, j, kk, l, w=which: (l[0], w, kk, j))

    def s_spec(which):
        return pl.BlockSpec((1, 1, spt, tn), lambda i, j, kk, l, w=which: (l[0], w, kk, j))

    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, kk)),
        pl.BlockSpec((tm, tk), lambda i, j, kk, l: (i, khalf + kk)),
        pl.BlockSpec((1, tk, tn), lambda i, j, kk, l: (l[0], kk, j)),
        c_spec(0), c_spec(1), s_spec(0), s_spec(1),
        c_spec(0), c_spec(1), s_spec(0), s_spec(1),
    ]
    args = [x, x, packed, sc4, sc4, d4, d4, mc4, mc4, dm4, dm4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_w4sub_l_kernel, group_size=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=n * k2 + 2 * (sc.size + mc.size) // nl
            + 2 * (d.size + dm.size) * 4 // nl + mp * k2 * 2 * 2 + mp * n * 2,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return out[:m] if mp != m else out


# ---- data construction -------------------------------------------------------


def split_qtensor(qt: QTensor, key):
    """Fabricate a two-level decomposition whose recomposed planes equal
    s = repeat(d,SB)*sc and b = repeat(dm,SB)*mc, and return equivalent
    f32-plane QTensor (for the reference path) + the compact parts."""
    nl, g, n = qt.scale.shape
    ks = jax.random.split(key, 4)
    sc = jax.random.randint(ks[0], (nl, g, n), 1, 64, jnp.uint8)
    mc = jax.random.randint(ks[1], (nl, g, n), 0, 64, jnp.uint8)
    d = jax.random.uniform(ks[2], (nl, g // SB, n), jnp.float32, 1e-4, 2e-4)
    dm = jax.random.uniform(ks[3], (nl, g // SB, n), jnp.float32, -2e-4, -1e-4)
    scale = jnp.repeat(d, SB, axis=1) * sc.astype(jnp.float32)
    bias = jnp.repeat(dm, SB, axis=1) * mc.astype(jnp.float32)
    ref = QTensor(data=qt.data, scale=scale, bias=bias,
                  group_size=qt.group_size, packed=True, code_bits=4,
                  ggml_type=None, chunks=1)
    return ref, (sc, d, mc, dm)


def cast_planes(qt, dtype):
    return QTensor(
        data=qt.data, scale=qt.scale.astype(dtype),
        bias=None if qt.bias is None else qt.bias.astype(dtype),
        group_size=qt.group_size, packed=qt.packed, code_bits=qt.code_bits,
        ggml_type=qt.ggml_type, chunks=qt.chunks,
    )


def slope_time(fn, n1=5, n2=25, reps=3):
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(n))
            best = min(best, time.perf_counter() - t0)
        return best

    run(n1)
    run(n2)
    return (run(n2) - run(n1)) / (n2 - n1)


cfg = llama8b_cfg()
B = 8
weights, _ = build_weights(cfg)
from mistralrs_tpu.models.llama import fuse_projections

weights = fuse_projections(weights, cfg)
layers = weights["layers"]
L = cfg.num_layers

key = jax.random.PRNGKey(42)
names = ["wqkv", "wo", "wgateup", "down"]
ref_layers = {}
sub_layers = {}
for i, nm in enumerate(names):
    ref, parts = split_qtensor(layers[nm], jax.random.fold_in(key, i))
    ref_layers[nm] = ref
    sub_layers[nm] = parts

bf16_layers = {nm: cast_planes(ref_layers[nm], jnp.bfloat16) for nm in names}

# bytes accounting
plane_bytes = sum(
    ref_layers[nm].data.size + ref_layers[nm].scale.size * 4 * 2
    for nm in names
)
sub_bytes = sum(
    ref_layers[nm].data.size + sub_layers[nm][0].size * 2
    + sub_layers[nm][1].size * 4 * 2
    for nm in names
)
bf16_bytes = sum(
    ref_layers[nm].data.size + ref_layers[nm].scale.size * 2 * 2
    for nm in names
)
emit(what="bytes_gb", f32planes=round(plane_bytes / 1e9, 3),
     bf16planes=round(bf16_bytes / 1e9, 3), sub=round(sub_bytes / 1e9, 3),
     floor_ms_f32=round(plane_bytes / 819e9 * 1e3, 3),
     floor_ms_bf16=round(bf16_bytes / 819e9 * 1e3, 3),
     floor_ms_sub=round(sub_bytes / 819e9 * 1e3, 3))


# ---- correctness: one layer, C_sub vs XLA reference --------------------------

x_test = jnp.asarray(
    np.random.default_rng(0).standard_normal((8, cfg.hidden_size)) * 0.1,
    jnp.bfloat16,
)
ref_out = None if os.environ.get("SKIP_CORRECTNESS") else qmm.quant_matmul(x_test, ref_layers["wqkv"], layer=jnp.int32(3),
                           backend="xla")
if ref_out is not None:
    sc, d, mc, dm = sub_layers["wqkv"]
    got = w4sub_matmul_l(x_test, ref_layers["wqkv"].data, sc, d, mc, dm,
                         jnp.int32(3), group_size=32)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref_out.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref_out.astype(jnp.float32))) + 1e-9)
    emit(what="C_sub_correctness", max_abs=round(err, 6), max_rel=round(rel, 6))


# ---- chains ------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0,))
def chain_cur(n_steps, lyrs):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def step(x, _):
        def layer(h, li):
            qkv = qmm.quant_matmul(h, lyrs["wqkv"], layer=li)
            q = qkv[..., : cfg.q_dim]
            ao = qmm.quant_matmul(q, lyrs["wo"], layer=li)
            gu = qmm.quant_matmul(ao, lyrs["wgateup"], layer=li)
            half = gu.shape[-1] // 2
            hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
            return qmm.quant_matmul(hid, lyrs["down"], layer=li), None

        y, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
        return 0.999 * y, None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


@functools.partial(jax.jit, static_argnums=(0,))
def chain_sub(n_steps, packed, subs):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def step(x, _):
        def layer(h, li):
            def mm(h, nm):
                sc, d, mc, dm = subs[nm]
                return w4sub_matmul_l(
                    h, packed[nm], sc, d, mc, dm, li, group_size=32
                )

            qkv = mm(h, "wqkv")
            q = qkv[..., : cfg.q_dim]
            ao = mm(q, "wo")
            gu = mm(ao, "wgateup")
            half = gu.shape[-1] // 2
            hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
            return mm(hid, "down").astype(x.dtype), None

        y, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
        return 0.999 * y, None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


packed_trees = {nm: ref_layers[nm].data for nm in names}
t = slope_time(lambda n: chain_cur(n, ref_layers))
emit(what="A_cur_f32planes_chain_ms", value=round(t * 1e3, 3))
t = slope_time(lambda n: chain_cur(n, bf16_layers))
emit(what="B_cur_bf16planes_chain_ms", value=round(t * 1e3, 3))
try:
    t = slope_time(lambda n: chain_sub(n, packed_trees, sub_layers))
    emit(what="C_sub_chain_ms", value=round(t * 1e3, 3))
except Exception as e:  # noqa: BLE001
    emit(what="C_sub_chain", error=str(e)[:400])

emit(what="done")
