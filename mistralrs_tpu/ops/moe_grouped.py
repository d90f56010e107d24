"""Grouped (ragged) MoE expert compute — the TPU analog of the reference's
grouped MoE GEMM kernels (`mistralrs-quant/kernels/moe_grouped/`,
`mistralrs-core/src/moe/experts`): tokens are sorted by expert, each
expert's group padded to a row-tile multiple, and ONE grouped matmul per
projection streams each needed expert's weights once per row-tile
(megablox formulation — scalar-prefetch tile→expert indices offset the
weight BlockSpecs).

Compared to the dense every-expert scan this does ``top_k/E`` of the FLOPs
(the prefill regime for large expert counts) and, for quantized banks,
skips the per-expert dynamic-slice copies the scan's ``xs`` would
materialize.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dataclasses import replace as _dc_replace

from ..quant.linear import LayerSlice
from ..quant.qtensor import QTensor
from .quant_matmul import _cdiv, _default_backend, _round_up, quant_matmul_grouped


def _dense_g_kernel(g_ref, x_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0],
        (((1,), (1,)), ((), ())),  # x [tm, tk] @ w [tn, tk]^T
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "interpret"))
def _dense_matmul_g(x, w, tile_idx, *, tm, tn, tk, interpret):
    """Grouped dense matmul: ``x [T*tm, K]`` @ ``w[tile_idx[i]] [N, K]``T."""
    mp, k = x.shape
    nb, n, _ = w.shape
    t = mp // tm
    grid = (t, _cdiv(n, tn), k // tk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk, g: (i, kk)),
            pl.BlockSpec((1, tn, tk), lambda i, j, kk, g: (g[i], j, kk)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, g: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _dense_g_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(tile_idx, jnp.int32), x, w)


def dense_matmul_grouped(
    x: jax.Array,
    w: jax.Array,  # [NB, N, K]
    tile_idx: jax.Array,
    *,
    tm: int,
    backend: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    if backend is None:
        backend = _default_backend()
    mp, k = x.shape
    if backend == "xla":
        wt = w[tile_idx].astype(x.dtype)  # [T, N, K]
        xt = x.reshape(-1, tm, k)
        out = jnp.einsum(
            "tmk,tnk->tmn", xt, wt, preferred_element_type=jnp.float32
        )
        return out.reshape(mp, -1).astype(x.dtype)
    n = w.shape[1]
    tn = 256 if n % 256 == 0 else 128
    tk = min(k, 2048)
    while k % tk != 0:
        tk //= 2
    return _dense_matmul_g(
        x, w, tile_idx, tm=tm, tn=tn, tk=tk, interpret=interpret
    )


def build_groups(
    topi: jax.Array,  # [n, k] expert choice per token
    topw: jax.Array,  # [n, k] combine weight
    num_banks: int,
    tm: int,
    valid: Optional[jax.Array] = None,  # [n, k] bool — False drops a choice
):
    """Sort (token, choice) pairs by expert and pad each group to ``tm``.

    Returns ``(st, dest, sw, tile_idx, mp)``: source token per pair, its
    padded destination row, its combine weight (0 for dropped pairs), the
    per-row-tile bank index, and the static padded row count."""
    n, k = topi.shape
    nk = n * k
    flat_e = topi.reshape(nk).astype(jnp.int32)
    flat_w = topw.reshape(nk)
    if valid is not None:
        v = valid.reshape(nk)
        # dropped pairs go to a trailing spill group that pads like a bank
        flat_e = jnp.where(v, flat_e, num_banks)
        flat_w = jnp.where(v, flat_w, 0.0)
        groups = num_banks + 1
    else:
        groups = num_banks
    order = jnp.argsort(flat_e, stable=True)
    se = flat_e[order]
    sw = flat_w[order]
    st = jnp.arange(nk)[order] // k  # source token of each sorted pair
    starts = jnp.searchsorted(se, jnp.arange(groups))
    sizes = jnp.diff(jnp.append(starts, nk))
    padded = _round_up_arr(sizes, tm)
    pad_off = jnp.cumsum(padded) - padded  # exclusive prefix
    rank = jnp.arange(nk) - starts[se]
    dest = pad_off[se] + rank
    # static worst case: nk rows + (tm-1) padding per non-empty group
    mp = _round_up(nk + min(groups, nk) * (tm - 1), tm)
    tile_start = jnp.arange(mp // tm) * tm
    cum = pad_off  # [groups] exclusive offsets
    tile_idx = jnp.clip(
        jnp.searchsorted(cum, tile_start, side="right") - 1, 0, num_banks - 1
    )
    return st, dest, sw, tile_idx, mp


def _round_up_arr(x, m):
    return (x + m - 1) // m * m


def moe_grouped_mlp(
    x: jax.Array,  # [n, H]
    experts: dict,  # gate/up/down: QTensor [E, ...] or dense [E, out, in]
    topw: jax.Array,  # [n, k]
    topi: jax.Array,  # [n, k]
    act,
    *,
    tm: Optional[int] = None,
    expert_offset: Optional[jax.Array] = None,  # EP: this shard's first id
    num_local: Optional[int] = None,  # EP: bank entries on this shard
    backend: Optional[str] = None,
    dequant_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Gated expert MLP (SwiGLU-family) over a ragged token→expert routing.

    Under expert parallelism pass ``expert_offset``/``num_local``: choices
    outside this shard's bank are dropped here and summed in by the other
    shards' psum (the caller still does ONE psum after the combine)."""
    n, h = x.shape
    k = topi.shape[-1]
    gate = experts["gate"]
    layer = None
    if isinstance(gate, LayerSlice):
        # stacked [L, E, ...] banks (scan scalar-prefetch path): flatten the
        # leading two axes into one [L·E, ...] bank — a free reshape — and
        # offset the tile→expert ids by layer·E so the grouped kernel
        # streams this layer's experts straight from the stacked HBM planes
        layer = gate.layer
        nb = gate.qt.data.shape[1]

        def _flat(v):
            qt = v.qt
            return _dc_replace(
                qt,
                data=qt.data.reshape((-1,) + qt.data.shape[2:]),
                scale=qt.scale.reshape((-1,) + qt.scale.shape[2:]),
                bias=None if qt.bias is None
                else qt.bias.reshape((-1,) + qt.bias.shape[2:]),
            )

        experts = {kk: _flat(v) for kk, v in experts.items()}
    else:
        nb = gate.data.shape[0] if isinstance(gate, QTensor) else gate.shape[0]
    if tm is None:
        tm = 16 if n * k <= 256 else 128
    valid = None
    if expert_offset is not None:
        local = topi - expert_offset
        valid = (local >= 0) & (local < (num_local or nb))
        topi = jnp.clip(local, 0, nb - 1)
    st, dest, sw, tile_idx, mp = build_groups(topi, topw, nb, tm, valid=valid)
    if layer is not None:
        tile_idx = tile_idx + layer * nb
    xs = jnp.zeros((mp, h), x.dtype).at[dest].set(x[st])

    def gmm(rows, w):
        if isinstance(w, QTensor):
            return quant_matmul_grouped(
                rows, w, tile_idx, tm=tm, backend=backend,
                dequant_dtype=dequant_dtype, interpret=interpret,
                out_dtype=rows.dtype,
            )
        return dense_matmul_grouped(
            rows, w, tile_idx, tm=tm, backend=backend, interpret=interpret
        )

    hidden = act(gmm(xs, experts["gate"])) * gmm(xs, experts["up"])
    y = gmm(hidden.astype(x.dtype), experts["down"])
    contrib = y[dest] * sw[:, None].astype(y.dtype)
    out = jnp.zeros((n, h), y.dtype).at[st].add(contrib)
    return out
