"""w4/w8 dequant-matmul kernel variants, slope-timed on the bench layer
geometry (llama3-8b, 32 layers, M=8). Reference from profile_decode:
current kernel chain = 17.0 ms/step. Roofline (f32 planes) 6.4 ms; with
bf16 planes 5.3 ms.

Variant F: scale expansion via MXU (sexp = E @ s with E the 0/1 group
expansion matrix), bias via (x @ E) @ b — VPU only unpacks+converts+1 mul.
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

from bench import llama8b_cfg, build_weights
from mistralrs_tpu.quant.qtensor import QTensor
from mistralrs_tpu.quant.linear import linear

OUT = open("/root/repo/exp/mm_kernels.out", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---- variant F kernels -----------------------------------------------------


def _w4f_kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, b_lo_ref,
                b_hi_ref, o_ref, acc_ref, *, group_size):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...].astype(jnp.int32)
    lo = (p & 15).astype(jnp.bfloat16)  # [TK, TN]
    hi = (p >> 4).astype(jnp.bfloat16)
    tk, tn = lo.shape
    gpt = tk // group_size
    rows = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 1)
    e = (rows // group_size == cols).astype(jnp.bfloat16)  # [TK, gpt]
    s_lo = s_lo_ref[...].reshape(gpt, tn).astype(jnp.bfloat16)
    s_hi = s_hi_ref[...].reshape(gpt, tn).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    sexp_lo = jax.lax.dot_general(
        e, s_lo, dn, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    sexp_hi = jax.lax.dot_general(
        e, s_hi, dn, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    acc = jax.lax.dot_general(x_lo, lo * sexp_lo, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x_hi, hi * sexp_hi, dn, preferred_element_type=jnp.float32)
    if b_lo_ref is not None:
        b_lo = b_lo_ref[...].reshape(gpt, tn).astype(jnp.bfloat16)
        b_hi = b_hi_ref[...].reshape(gpt, tn).astype(jnp.bfloat16)
        xs_lo = jax.lax.dot_general(
            x_lo, e, dn, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        xs_hi = jax.lax.dot_general(
            x_hi, e, dn, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(xs_lo, b_lo, dn, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(xs_hi, b_hi, dn, preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _w4c_kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, b_lo_ref,
                b_hi_ref, o_ref, acc_ref, *, group_size):
    """Variant C: batched per-group dot on the MXU; scales applied to the
    [gpt, TM, TN] partials (tiny vs per-weight expansion)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...].astype(jnp.int32)
    lo = (p & 15).astype(jnp.bfloat16)  # [TK, TN]
    hi = (p >> 4).astype(jnp.bfloat16)
    tk, tn = lo.shape
    gs = group_size
    gpt = tk // gs
    tm = x_lo_ref.shape[0]
    dnb = (((2,), (1,)), ((0,), (0,)))  # [gpt,tm,gs] @ [gpt,gs,tn] -> [gpt,tm,tn]

    def half(x_ref_, w, s_ref_, b_ref_):
        x3 = x_ref_[...].reshape(tm, gpt, gs).swapaxes(0, 1)  # [gpt, tm, gs]
        part = jax.lax.dot_general(
            x3, w.reshape(gpt, gs, tn), dnb, preferred_element_type=jnp.float32
        )  # [gpt, tm, tn]
        s = s_ref_[...].reshape(gpt, 1, tn).astype(jnp.float32)
        out = part * s
        if b_ref_ is not None:
            xs = jnp.sum(x3.astype(jnp.float32), axis=2, keepdims=True)  # [gpt,tm,1]
            out += xs * b_ref_[...].reshape(gpt, 1, tn).astype(jnp.float32)
        return jnp.sum(out, axis=0)

    acc_ref[...] += half(x_lo_ref, lo, s_lo_ref, b_lo_ref) + half(
        x_hi_ref, hi, s_hi_ref, b_hi_ref
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _w4floor_kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, b_lo_ref,
                    b_hi_ref, o_ref, acc_ref, *, group_size):
    """VPU floor: unpack+convert+dot only, NO scaling (wrong numerics —
    timing lower bound)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...].astype(jnp.int32)
    lo = (p & 15).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        x_lo_ref[...], lo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(x_hi_ref[...], hi, dn, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _w8f_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, group_size, signed):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.int32)
    if not signed:
        q = q & 0xFF
    w = q.astype(jnp.bfloat16)
    tk, tn = w.shape
    gpt = tk // group_size
    rows = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tk, gpt), 1)
    e = (rows // group_size == cols).astype(jnp.bfloat16)
    s = s_ref[...].reshape(gpt, tn).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    sexp = jax.lax.dot_general(
        e, s, dn, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    x = x_ref[...]
    acc = jax.lax.dot_general(x, w * sexp, dn, preferred_element_type=jnp.float32)
    if b_ref is not None:
        b = b_ref[...].reshape(gpt, tn).astype(jnp.bfloat16)
        xs = jax.lax.dot_general(
            x, e, dn, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(xs, b, dn, preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


TN, TK = 512, 1024


_W4_KERNELS = {"f": _w4f_kernel, "c": _w4c_kernel, "floor": _w4floor_kernel}


@functools.partial(jax.jit, static_argnames=("group_size", "variant"))
def w4f_matmul(x, packed, scale, bias, *, group_size, variant="f"):
    m, k = x.shape
    k2, n = packed.shape
    tm = min(_round_up(m, 16), 256)
    tn, tk = TN, TK
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k2 // tk)
    gpt = tk // group_size
    khalf = k2 // tk
    g2 = scale.shape[0] // 2
    scale3 = scale.reshape(2, g2, n)
    bias3 = None if bias is None else bias.reshape(2, g2, n)

    x_lo_spec = pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM)
    x_hi_spec = pl.BlockSpec((tm, tk), lambda i, j, kk: (i, khalf + kk), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    s_lo_spec = pl.BlockSpec((1, gpt, tn), lambda i, j, kk: (0, kk, j), memory_space=pltpu.VMEM)
    s_hi_spec = pl.BlockSpec((1, gpt, tn), lambda i, j, kk: (1, kk, j), memory_space=pltpu.VMEM)

    has_bias = bias is not None

    kern = _W4_KERNELS[variant]

    def kernel(*refs):
        if has_bias:
            xl, xh, p, sl, sh, bl, bh, o, acc = refs
        else:
            xl, xh, p, sl, sh, o, acc = refs
            bl = bh = None
        kern(xl, xh, p, sl, sh, bl, bh, o, acc, group_size=group_size)

    in_specs = [x_lo_spec, x_hi_spec, p_spec, s_lo_spec, s_hi_spec]
    args = [x, x, packed, scale3, scale3]
    if has_bias:
        in_specs += [s_lo_spec, s_hi_spec]
        args += [bias3, bias3]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k2,
            bytes_accessed=n * k2 + 2 * scale.size * scale.dtype.itemsize
            + mp * k2 * 2 * 2 + mp * n * 2,
            transcendentals=0,
        ),
    )(*args)
    return out[:m] if mp != m else out


@functools.partial(jax.jit, static_argnames=("group_size", "signed"))
def w8f_matmul(x, codes, scale, bias, *, group_size, signed):
    m, k = x.shape
    _, n = codes.shape
    tm = min(_round_up(m, 16), 256)
    tn, tk = TN, TK
    while tk > group_size and k % tk:
        tk //= 2
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // tm, _cdiv(n, tn), k // tk)
    gpt = tk // group_size
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            xr, qr, sr, br, o, acc = refs
        else:
            xr, qr, sr, o, acc = refs
            br = None
        _w8f_kernel(xr, qr, sr, br, o, acc, group_size=group_size, signed=signed)

    s_spec = pl.BlockSpec((gpt, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        s_spec,
    ]
    args = [x, codes, scale]
    if has_bias:
        in_specs.append(s_spec)
        args.append(bias)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=n * k + scale.size * scale.dtype.itemsize + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
    )(*args)
    return out[:m] if mp != m else out


# ---- harness ---------------------------------------------------------------


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
    return (run(n2) - run(n1)) / (n2 - n1)


cfg = llama8b_cfg()
B = 8
weights, _ = build_weights(cfg)
from mistralrs_tpu.models.llama import fuse_projections

weights = fuse_projections(weights, cfg)
layers = weights["layers"]


def cast_planes(qt, dtype):
    return QTensor(
        data=qt.data, scale=qt.scale.astype(dtype),
        bias=None if qt.bias is None else qt.bias.astype(dtype),
        group_size=qt.group_size, packed=qt.packed, code_bits=qt.code_bits,
        ggml_type=qt.ggml_type, chunks=qt.chunks,
    )


def layer_chain(mm):
    """mm(x [B,K], qt) -> [B,N]"""

    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n_steps, layers):
        x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

        def step(x, _):
            def layer(h, lw):
                qkv = mm(h, lw["wqkv"])
                q = qkv[..., : cfg.q_dim]
                ao = mm(q, lw["wo"])
                gu = mm(ao, lw["wgateup"])
                half = gu.shape[-1] // 2
                hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
                return mm(hid, lw["down"]), None

            y, _ = jax.lax.scan(layer, x, layers)
            return 0.999 * y, None

        y, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return y

    return chain


def make_mm(variant):
    def mm(x, qt):
        return w4f_matmul(x, qt.data, qt.scale, qt.bias,
                          group_size=qt.group_size, variant=variant)

    return mm


# correctness spot-check vs XLA on ONE layer slice
l0 = jax.tree_util.tree_map(
    lambda a: a[0], layers["wqkv"],
    is_leaf=lambda a: not isinstance(a, QTensor),
)
x_test = jnp.asarray(np.random.default_rng(0).standard_normal((8, cfg.hidden_size)) * 0.1, jnp.bfloat16)
ref = linear(x_test, l0, backend="xla")
layers_bf16 = {
    kk: (cast_planes(vv, jnp.bfloat16) if isinstance(vv, QTensor) else vv)
    for kk, vv in layers.items()
}

for variant in ("f", "c"):
    try:
        got = make_mm(variant)(x_test, l0)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        emit(what=f"w4{variant}_correctness", max_abs=round(err, 5), max_rel=round(rel, 5))
    except Exception as e:  # noqa: BLE001
        emit(what=f"w4{variant}_correctness", error=str(e)[:300])
        continue
    t = slope_time(layer_chain(make_mm(variant)), (layers,))
    emit(what=f"w4{variant}_f32planes_ms", value=round(t * 1e3, 3))
    t = slope_time(layer_chain(make_mm(variant)), (layers_bf16,))
    emit(what=f"w4{variant}_bf16planes_ms", value=round(t * 1e3, 3))

try:
    t = slope_time(layer_chain(make_mm("floor")), (layers_bf16,))
    emit(what="w4floor_bf16planes_ms", value=round(t * 1e3, 3))
except Exception as e:  # noqa: BLE001
    emit(what="w4floor", error=str(e)[:300])

# w8 lm_head: current vs F
head = weights["lm_head"]


@functools.partial(jax.jit, static_argnums=(0,))
def head_chain_f(n_steps, head):
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16) * 0.01

    def step(x, _):
        logits = w8f_matmul(x, head.data, head.scale, head.bias,
                            group_size=head.group_size, signed=True)
        return x * 0.999 + logits[:, : cfg.hidden_size].astype(x.dtype) * 1e-6, None

    y, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return y


t = slope_time(head_chain_f, (head,))
emit(what="w8f_head_f32planes_ms", value=round(t * 1e3, 3))
head_bf = cast_planes(head, jnp.bfloat16)
t = slope_time(head_chain_f, (head_bf,))
emit(what="w8f_head_bf16planes_ms", value=round(t * 1e3, 3))

emit(what="done")
