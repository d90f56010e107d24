"""FP8 weight family (the analog of `mistralrs-quant/src/{pertensor_fp8,
scalar_fp8,blockwise_fp8}`): e4m3 storage with per-tensor or blockwise
(128×128, DeepSeek-style) scales.

On TPU, fp8→bf16 conversion is a native XLA op, so the forward is expressed
as jnp and fused by XLA; a Pallas fused variant only pays off when fp8
matmul units exist (v6e+), where `dot_general` with fp8 inputs already
lowers natively.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

E4M3_MAX = 448.0


@dataclass(frozen=True)
class Fp8Tensor:
    """[N, K] weight in e4m3 with per-tensor or blockwise scales.

    scale shapes: [] (per-tensor) or [ceil(N/bn), ceil(K/bk)] (blockwise).
    """

    data: jax.Array  # f8_e4m3 [N, K]
    scale: jax.Array  # f32, [] or [nb, kb]
    block_shape: Optional[tuple[int, int]] = None  # (bn, bk) when blockwise

    @property
    def shape(self):
        return self.data.shape

    @property
    def out_features(self) -> int:
        return self.data.shape[0]

    @property
    def in_features(self) -> int:
        return self.data.shape[1]

    @property
    def nbytes(self) -> int:
        return self.data.size + self.scale.size * 4

    @classmethod
    def quantize(cls, w: np.ndarray, block_shape: Optional[tuple[int, int]] = None):
        w = np.asarray(w, np.float32)
        n, k = w.shape
        if block_shape is None:
            s = float(np.abs(w).max() / E4M3_MAX) or 1.0
            data = jnp.asarray(w / s, jnp.float8_e4m3fn)
            return cls(data, jnp.asarray(s, jnp.float32), None)
        bn, bk = block_shape
        nb, kb = -(-n // bn), -(-k // bk)
        wp = np.zeros((nb * bn, kb * bk), np.float32)
        wp[:n, :k] = w
        blocks = wp.reshape(nb, bn, kb, bk)
        amax = np.abs(blocks).max(axis=(1, 3))
        s = np.where(amax > 0, amax / E4M3_MAX, 1.0).astype(np.float32)
        scaled = blocks / s[:, None, :, None]
        data = jnp.asarray(
            scaled.reshape(nb * bn, kb * bk)[:n, :k], jnp.float8_e4m3fn
        )
        return cls(data, jnp.asarray(s), (bn, bk))

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        w = self.data.astype(jnp.float32)
        if self.block_shape is None:
            return (w * self.scale).astype(dtype)
        bn, bk = self.block_shape
        n, k = w.shape
        nb, kb = self.scale.shape
        s = jnp.repeat(jnp.repeat(self.scale, bn, axis=0), bk, axis=1)[:n, :k]
        return (w * s).astype(dtype)


jax.tree_util.register_dataclass(
    Fp8Tensor, data_fields=["data", "scale"], meta_fields=["block_shape"]
)


def fp8_matmul(x: jax.Array, w: Fp8Tensor, out_dtype=None) -> jax.Array:
    """x [.., K] @ w.T with on-the-fly dequant (XLA fuses the convert)."""
    out_dtype = out_dtype or x.dtype
    wd = w.dequantize(jnp.bfloat16)
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), wd,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
