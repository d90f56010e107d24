"""Uniform linear-layer dispatch — the analog of the reference's
``QuantMethod`` trait object call (`mistralrs-quant/src/lib.rs:1293`):
one entry point regardless of whether the weight is a planar-quantized
:class:`QTensor` or a plain dense array.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import quant_matmul
from .fp8 import Fp8Tensor, fp8_matmul
from .qtensor import QTensor

Weight = Union[QTensor, Fp8Tensor, jax.Array]


@dataclass
class LayerSlice:
    """Layer ``layer`` of a STACKED ``[L, ...]`` quantized weight.

    Built inside a decoder's layer scan so the matmul kernel indexes the
    stacked HBM planes directly (scalar-prefetch BlockSpec offset) instead
    of the scan materializing a per-layer dynamic-slice copy — the copy
    triples weight HBM traffic on the decode hot path."""

    qt: QTensor  # stacked planes [L, ...]
    layer: jax.Array  # traced i32 scalar


def linear(
    x: jax.Array,
    w: Weight,
    bias: Optional[jax.Array] = None,
    *,
    backend: Optional[str] = None,
) -> jax.Array:
    """``x @ w.T (+ bias)`` with ``w`` of shape [out, in] (HF convention)."""
    if isinstance(w, LayerSlice):
        out = quant_matmul(x, w.qt, layer=w.layer, backend=backend)
    elif isinstance(w, QTensor):
        out = quant_matmul(x, w, backend=backend)
    elif isinstance(w, Fp8Tensor):
        out = fp8_matmul(x, w)
    else:
        out = jax.lax.dot_general(
            x,
            w.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def embedding_lookup(ids: jax.Array, w: Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Row gather from an embedding table (QuantMethod::embedding_forward)."""
    if isinstance(w, QTensor):
        def take_rows(km):  # K-major [*, V]: take ids along V → [ids..., *]
            return jnp.moveaxis(jnp.take(km, ids, axis=1), 0, -1)

        data = take_rows(w.data)  # [ids..., Kd]
        scale = take_rows(w.scale)  # [ids..., G]
        bias = None if w.bias is None else take_rows(w.bias)
        if w.packed:
            d = data.astype(jnp.int32)
            codes = jnp.concatenate([d & 15, d >> 4], axis=-1)
        elif w.data.dtype == jnp.int8:
            codes = data.astype(jnp.int32)
        else:
            codes = data.astype(jnp.int32) & 0xFF
        gs = w.group_size
        g = codes.shape[-1] // gs
        q = codes.astype(jnp.float32).reshape(*codes.shape[:-1], g, gs)
        out = q * scale[..., None]
        if bias is not None:
            out = out + bias[..., None]
        return out.reshape(*codes.shape).astype(dtype)
    return jnp.take(w, ids, axis=0).astype(dtype)
