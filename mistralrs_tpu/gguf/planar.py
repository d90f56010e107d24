"""GGUF block formats → TPU-planar (q, scale, bias) decomposition.

The GGUF superblock layouts (nested 6-bit scales, nibble interleaves) are
hostile to TPU lane-width vector ops, so — like the reference's Marlin-style
load-time repack (`mistralrs-quant/kernels/marlin/marlin_repack.cu`,
`mistralrs-quant/src/gguf/packed_affine.rs`) — we re-lay every quantized
tensor out at load time into three *flat* arrays:

    value[k] = scale[k // group_size] * q[k] + bias[k // group_size]

* ``q``      — the raw integer codes, int8 (signed formats) or uint8
               (affine formats), one element per weight.
* ``scale``  — float32 effective per-group scale (= f16(d) * int(sc): the
               product of a float16 and a ≤8-bit integer is exact in f32, so
               this decomposition is *bit-exact* vs. the GGUF dequant).
* ``bias``   — float32 effective per-group offset, or None for symmetric
               formats.

This is the single representation every Pallas dequant-matmul kernel
consumes; semantics validated against :mod:`.quants` (the bit-exact numpy
reference) in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .constants import GGMLType, QK_K, type_traits
from .quants import (
    _LOCAL,
    _Q4K_BYTE,
    _Q4K_HI,
    _Q5K_HI_BYTE,
    _Q5K_HI_SHIFT,
    _Q6K_QH_BYTE,
    _Q6K_QH_SHIFT,
    _Q6K_QL_BYTE,
    _Q6K_QL_SHIFT,
    _Q2K_BYTE,
    _Q2K_SHIFT,
    _Q3K_HM_BYTE,
    _Q3K_HM_SHIFT,
    _blocks,
    _f16,
    _q4k_nibbles,
    _q5_high_bits,
    _unpack_q3k_scales,
    _unpack_scale_min_k4,
)


@dataclass
class PlanarQuant:
    """Flat planar decomposition of a quantized tensor (numpy, host-side)."""

    q: np.ndarray  # [n_elements] int8 or uint8 integer codes
    scale: np.ndarray  # [n_groups] float32
    bias: np.ndarray | None  # [n_groups] float32, or None (symmetric)
    group_size: int
    code_bits: int  # bit-width of the codes (2..8)
    signed: bool  # True → q is int8 codes; False → uint8 codes

    def dequantize(self) -> np.ndarray:
        g = self.q.astype(np.float32).reshape(-1, self.group_size)
        out = self.scale[:, None] * g
        if self.bias is not None:
            out = out + self.bias[:, None]
        return out.reshape(-1)


def _planar_q4_0(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q4_0)
    d = _f16(b[:, 0:2])[:, 0]
    qs = b[:, 2:18]
    q = np.concatenate([qs & 15, qs >> 4], axis=1).astype(np.uint8)
    return PlanarQuant(q.reshape(-1), d, -8.0 * d, 32, 4, False)


def _planar_q4_1(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q4_1)
    d = _f16(b[:, 0:2])[:, 0]
    m = _f16(b[:, 2:4])[:, 0]
    qs = b[:, 4:20]
    q = np.concatenate([qs & 15, qs >> 4], axis=1).astype(np.uint8)
    return PlanarQuant(q.reshape(-1), d, m, 32, 4, False)


def _planar_q5_0(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q5_0)
    d = _f16(b[:, 0:2])[:, 0]
    hi = _q5_high_bits(b[:, 2:6])
    qs = b[:, 6:22]
    q = (np.concatenate([qs & 15, qs >> 4], axis=1) | (hi << 4)).astype(np.uint8)
    return PlanarQuant(q.reshape(-1), d, -16.0 * d, 32, 5, False)


def _planar_q5_1(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q5_1)
    d = _f16(b[:, 0:2])[:, 0]
    m = _f16(b[:, 2:4])[:, 0]
    hi = _q5_high_bits(b[:, 4:8])
    qs = b[:, 8:24]
    q = (np.concatenate([qs & 15, qs >> 4], axis=1) | (hi << 4)).astype(np.uint8)
    return PlanarQuant(q.reshape(-1), d, m, 32, 5, False)


def _planar_q8_0(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q8_0)
    d = _f16(b[:, 0:2])[:, 0]
    q = b[:, 2:34].view(np.int8)
    return PlanarQuant(q.reshape(-1).copy(), d, None, 32, 8, True)


def _planar_q4_k(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q4_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    q = _q4k_nibbles(b[:, 16:144])
    scale = (d * sc.astype(np.float32)).reshape(-1)  # [n_sb * 8]
    bias = (-dmin * mn.astype(np.float32)).reshape(-1)
    return PlanarQuant(q.reshape(-1), scale, bias, 32, 4, False)


def _planar_q5_k(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q5_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    lo = _q4k_nibbles(b[:, 48:176])
    hi = (qh[:, _Q5K_HI_BYTE] >> _Q5K_HI_SHIFT[None, :]) & 1
    q = (lo | (hi << 4)).astype(np.uint8)
    scale = (d * sc.astype(np.float32)).reshape(-1)
    bias = (-dmin * mn.astype(np.float32)).reshape(-1)
    return PlanarQuant(q.reshape(-1), scale, bias, 32, 5, False)


def _planar_q6_k(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q6_K)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    sc8 = b[:, 192:208].view(np.int8).astype(np.float32)
    d = _f16(b[:, 208:210])
    lo = (ql[:, _Q6K_QL_BYTE] >> _Q6K_QL_SHIFT[None, :]) & 15
    hi = (qh[:, _Q6K_QH_BYTE] >> _Q6K_QH_SHIFT[None, :]) & 3
    q = (lo | (hi << 4)).astype(np.int16) - 32
    scale = (d * sc8).reshape(-1)  # [n_sb * 16]
    return PlanarQuant(q.astype(np.int8).reshape(-1), scale, None, 16, 7, True)


def _planar_q3_k(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q3_K)
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    sc6 = _unpack_q3k_scales(b[:, 96:108]).astype(np.float32)
    d = _f16(b[:, 108:110])
    lo = (qs[:, _Q2K_BYTE] >> _Q2K_SHIFT[None, :]) & 3
    hi = (hmask[:, _Q3K_HM_BYTE] >> _Q3K_HM_SHIFT[None, :]) & 1
    q = (lo | (hi << 2)).astype(np.int16) - 4
    scale = (d * sc6).reshape(-1)
    return PlanarQuant(q.astype(np.int8).reshape(-1), scale, None, 16, 3, True)


def _planar_q2_k(raw: np.ndarray) -> PlanarQuant:
    b = _blocks(raw, GGMLType.Q2_K)
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    q = ((qs[:, _Q2K_BYTE] >> _Q2K_SHIFT[None, :]) & 3).astype(np.uint8)
    scale = (d * (scales & 15).astype(np.float32)).reshape(-1)
    bias = (-dmin * (scales >> 4).astype(np.float32)).reshape(-1)
    return PlanarQuant(q.reshape(-1), scale, bias, 16, 2, False)


_PLANARIZERS = {
    GGMLType.Q4_0: _planar_q4_0,
    GGMLType.Q4_1: _planar_q4_1,
    GGMLType.Q5_0: _planar_q5_0,
    GGMLType.Q5_1: _planar_q5_1,
    GGMLType.Q8_0: _planar_q8_0,
    GGMLType.Q2_K: _planar_q2_k,
    GGMLType.Q3_K: _planar_q3_k,
    GGMLType.Q4_K: _planar_q4_k,
    GGMLType.Q5_K: _planar_q5_k,
    GGMLType.Q6_K: _planar_q6_k,
}

PLANAR_TYPES = frozenset(_PLANARIZERS)


_NATIVE_META = {
    GGMLType.Q4_K: (32, 4, False),
    GGMLType.Q5_K: (32, 5, False),
    GGMLType.Q6_K: (16, 7, True),
    GGMLType.Q8_0: (32, 8, True),
    GGMLType.Q4_0: (32, 4, False),
}


def to_planar(raw: np.ndarray, t: GGMLType) -> PlanarQuant:
    """Decompose raw GGUF tensor bytes into the flat planar representation.

    Uses the multithreaded native decoder (csrc/planar.cpp) when available;
    falls back to the vectorized numpy reference."""
    if t in _NATIVE_META:
        from . import native

        out = native.decode(t.name, raw)
        if out is not None:
            q, scale, bias = out
            gs, bits, signed = _NATIVE_META[t]
            return PlanarQuant(q, scale, bias, gs, bits, signed)
    fn = _PLANARIZERS.get(t)
    if fn is None:
        raise NotImplementedError(f"no planar decomposition for {t!r}")
    return fn(raw)


def widen_planar(p: PlanarQuant) -> PlanarQuant:
    """Convert any planar layout to the common (int8, group 16, biased) form
    so tensors of different quant types can be stacked uniformly."""
    if p.group_size % 16 != 0:
        raise ValueError(f"group size {p.group_size} not divisible by 16")
    rep = p.group_size // 16
    scale = np.repeat(p.scale, rep) if rep > 1 else p.scale
    if p.bias is None:
        bias = np.zeros_like(scale)
    else:
        bias = np.repeat(p.bias, rep) if rep > 1 else p.bias
    return PlanarQuant(
        q=p.q.astype(np.int8),  # unsigned codes are ≤31, so int8 is lossless
        scale=scale,
        bias=bias,
        group_size=16,
        code_bits=8,
        signed=True,
    )
