"""Device-resident quantized tensors (the TPU analog of candle's ``QTensor``).

A :class:`QTensor` is a pytree holding a weight matrix ``W`` of logical shape
``[N, K]`` (out-features, in-features — HF convention) in the flat planar
decomposition produced by :mod:`mistralrs_tpu.gguf.planar`:

    w[n, k] = scale[k // group_size, n] * q[k, n] + bias[k // group_size, n]

**Everything is stored K-major** (transposed relative to HF): codes ``[K, N]``
and scales ``[K // gs, N]``. This is the TPU-natural layout — the Pallas
dequant-matmul streams code tiles ``[TK, TN]``, expands scales along
*sublanes* (cheap broadcast), and feeds the MXU the canonical
``x[TM, TK] @ w[TK, TN]`` contraction with zero transposes or lane shuffles.
It plays the role of the reference's Marlin-style load-time repack
(`mistralrs-quant/kernels/marlin/marlin_repack.cu`,
`mistralrs-quant/src/gguf/packed_affine.rs`) re-thought for TPU tiling.

Sub-byte unsigned codes are additionally *split-half packed* along K: byte
``j`` holds code ``j`` (low nibble) and code ``j + K/2`` (high nibble), so
unpacking yields two full-width ``[K/2, N]`` planes with no interleave.

Scales/biases are exact f32 products of the GGUF f16 superblock scales and
integer sub-scales, so dequantization is bit-identical to the GGUF spec.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.planar import PlanarQuant, to_planar
from ..gguf.quants import quantize as gguf_quantize


@dataclass(frozen=True)
class QTensor:
    """Quantized ``[N, K]`` weight matrix in planar layout."""

    data: jax.Array  # uint8 [K//2, N] (packed) or int8/uint8 [K, N]
    scale: jax.Array  # f32 [K // group_size, N]
    bias: Optional[jax.Array]  # f32 [K // group_size, N] or None

    group_size: int = 32
    packed: bool = False
    code_bits: int = 8
    ggml_type: Optional[GGMLType] = None
    # Number of independent split-half packing segments along K. Row-parallel
    # (K-sharded) weights are packed per TP shard so each device's local slice
    # is itself split-half packed (analog of the reference's per-rank shard
    # loading, mistralrs-quant/src/safetensors.rs).
    chunks: int = 1

    @property
    def shape(self) -> tuple[int, ...]:
        """Logical (*lead, out_features, in_features) — stacked tensors
        (layer- or expert-banks) keep their leading dims."""
        *lead, kd, n = self.data.shape
        return (*lead, n, kd * 2 if self.packed else kd)

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def nbytes(self) -> int:
        n = self.data.size * self.data.dtype.itemsize
        n += self.scale.size * self.scale.dtype.itemsize
        if self.bias is not None:
            n += self.bias.size * self.bias.dtype.itemsize
        return n

    # -- construction -------------------------------------------------------

    @classmethod
    def from_planar(
        cls,
        planar: PlanarQuant,
        shape: tuple[int, int],
        ggml_type: GGMLType | None = None,
        chunks: int = 1,
    ) -> "QTensor":
        n, k = shape
        gs = planar.group_size
        if k % gs != 0:
            raise ValueError(f"K={k} not divisible by group size {gs}")
        q = np.ascontiguousarray(planar.q.reshape(n, k).T)  # [K, N]
        scale = np.ascontiguousarray(
            planar.scale.reshape(n, k // gs).astype(np.float32).T
        )
        bias = (
            None
            if planar.bias is None
            else np.ascontiguousarray(
                planar.bias.reshape(n, k // gs).astype(np.float32).T
            )
        )
        kc = k // chunks
        pack = (
            (not planar.signed)
            and planar.code_bits <= 4
            and k % chunks == 0
            and (kc // 2) % gs == 0
        )
        if pack:
            qc = q.reshape(chunks, kc, n)
            half = kc // 2
            data = (qc[:, :half] | (qc[:, half:] << 4)).reshape(k // 2, n).astype(np.uint8)
        else:
            chunks = 1
            data = q.astype(np.int8 if planar.signed else np.uint8)
        return cls(
            data=jnp.asarray(data),
            scale=jnp.asarray(scale),
            bias=None if bias is None else jnp.asarray(bias),
            group_size=gs,
            packed=pack,
            code_bits=planar.code_bits,
            ggml_type=ggml_type,
            chunks=chunks,
        )

    @classmethod
    def from_gguf_raw(
        cls, raw: np.ndarray, t: GGMLType, shape: tuple[int, int], chunks: int = 1
    ) -> "QTensor":
        return cls.from_planar(to_planar(raw, t), shape, ggml_type=t, chunks=chunks)

    @classmethod
    def quantize(cls, w: np.ndarray, t: GGMLType, chunks: int = 1) -> "QTensor":
        """ISQ entry point: quantize a float ``[N, K]`` matrix to GGUF type
        ``t``. ``chunks`` = row-parallel TP degree (per-shard nibble packing)."""
        w = np.asarray(w, dtype=np.float32)
        raw = gguf_quantize(w, t)
        return cls.from_gguf_raw(raw, t, w.shape, chunks=chunks)

    # -- access -------------------------------------------------------------

    def unpack_codes(self) -> jax.Array:
        """Integer codes as int32 ``[K, N]`` (kernel-independent reference)."""
        if self.packed:
            k2, n = self.data.shape
            d = self.data.astype(jnp.int32).reshape(self.chunks, k2 // self.chunks, n)
            return jnp.concatenate([d & 15, d >> 4], axis=1).reshape(k2 * 2, n)
        if self.data.dtype == jnp.int8:
            return self.data.astype(jnp.int32)
        return self.data.astype(jnp.int32) & 0xFF

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Full dequantization via XLA; returns logical ``[*lead, N, K]``
        (stacked layer/expert banks map over their leading dims)."""
        if self.data.ndim > 2:
            if self.bias is None:
                fn = jax.vmap(
                    lambda d, s: replace(self, data=d, scale=s).dequantize(dtype)
                )
                return fn(self.data, self.scale)
            fn = jax.vmap(
                lambda d, s, b: replace(
                    self, data=d, scale=s, bias=b
                ).dequantize(dtype)
            )
            return fn(self.data, self.scale, self.bias)
        n, k = self.shape
        g = k // self.group_size
        q = self.unpack_codes().astype(jnp.float32).reshape(g, self.group_size, n)
        w = q * self.scale[:, None, :]
        if self.bias is not None:
            w = w + self.bias[:, None, :]
        return w.reshape(k, n).T.astype(dtype)

    def astype_scales(self, dtype) -> "QTensor":
        return replace(
            self,
            scale=self.scale.astype(dtype),
            bias=None if self.bias is None else self.bias.astype(dtype),
        )


# Register the dataclass as a pytree with static metadata fields.
# (jax.tree_util.register_dataclass needs explicit field lists because the
# `bias` leaf may be None and the tail fields are static.)
jax.tree_util.register_dataclass(
    QTensor,
    data_fields=["data", "scale", "bias"],
    meta_fields=["group_size", "packed", "code_bits", "ggml_type", "chunks"],
)


def apply_scale_dtype(weights, dtype=None):
    """Convert every QTensor's scale/bias planes in a weights tree.

    f32 planes double a 4-bit tensor's effective bits (4.5 → 8 bpw for
    Q4_K-style group 32): bf16 halves them (→ 6 bpw) at ≤2⁻⁹ relative scale
    error (ΔPPL +0.0003 measured, tests/test_perplexity.py) — a 25% HBM
    footprint saving for memory-constrained serving. Default stays f32:
    Mosaic handles bf16 scale tiles poorly on the decode matmul hot path
    (measured 9.6 → 13.6 ms per step). MRSTPU_SCALE_DTYPE=bf16 opts in.
    """
    import os

    if dtype is None:
        name = os.environ.get("MRSTPU_SCALE_DTYPE", "f32")
        if name in ("f32", "float32"):
            return weights
        dtype = jnp.bfloat16

    def walk(x):
        if isinstance(x, QTensor):
            return x.astype_scales(dtype)
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            t = type(x)
            return t(walk(v) for v in x)
        return x

    return walk(weights)
