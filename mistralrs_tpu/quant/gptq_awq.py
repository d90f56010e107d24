"""GPTQ / AWQ checkpoint decoding → planar QTensor.

The analog of the reference's GPTQ/AWQ support
(`mistralrs-quant/src/gptq/`, Marlin repack `kernels/marlin/marlin_repack.cu`):
instead of a CUDA repack, both formats decode into the same flat planar
(codes, scale, bias) decomposition as GGUF k-quants, so the one Pallas
fused dequant-matmul kernel family serves them all.

Format facts (vLLM/AutoGPTQ/AutoAWQ conventions):
* GPTQ: ``qweight`` int32 [K/8, N] — eight 4-bit codes per int32 along K;
  ``qzeros`` int32 [K/g, N/8] (same nibble packing along N); ``scales`` f16
  [K/g, N]; optional ``g_idx`` [K] (act-order; we re-sort rows to groups).
  Dequant: w[k,n] = s[g,n] * (q[k,n] - (z[g,n] + zero_offset)), where
  zero_offset=1 for old-style GPTQ ("sym=False v1"), 0 for v2 checkpoints.
* AWQ: ``qweight`` int32 [K, N/8] — eight 4-bit codes per int32 along N in
  the interleaved order (0,2,4,6,1,3,5,7); ``qzeros`` int32 [K/g, N/8] same
  packing; ``scales`` f16 [K/g, N]. Dequant: w = s * (q - z).

Both also support 8-bit (four codes per int32 for GPTQ; AWQ is 4-bit only
in practice).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..gguf.planar import PlanarQuant
from .qtensor import QTensor

_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
_AWQ_INV = np.argsort(_AWQ_ORDER)  # position of logical column j in the packed word


def _unpack_gptq_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """[K/(32/bits), N] int32 → [K, N] uint8 codes."""
    per = 32 // bits
    p = qweight.astype(np.uint32)
    mask = (1 << bits) - 1
    cols = [(p >> (i * bits)) & mask for i in range(per)]
    kq, n = qweight.shape
    out = np.empty((kq * per, n), np.uint8)
    for i, c in enumerate(cols):
        out[i::per] = c.astype(np.uint8)
    return out


def _unpack_cols(qzeros: np.ndarray, bits: int, awq: bool) -> np.ndarray:
    """[G, N/(32/bits)] int32 → [G, N] uint8 codes (column packing)."""
    per = 32 // bits
    p = qzeros.astype(np.uint32)
    mask = (1 << bits) - 1
    g, nq = qzeros.shape
    out = np.empty((g, nq * per), np.uint8)
    for i in range(per):
        logical = _AWQ_ORDER[i] if (awq and bits == 4) else i
        out[:, logical::per] = ((p >> (i * bits)) & mask).astype(np.uint8)
    return out


def gptq_to_qtensor(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
    bits: int = 4,
    zero_offset: int = 1,
    chunks: int = 1,
) -> QTensor:
    """Decode a GPTQ layer (tensors as stored: K-major) to a QTensor [N, K]."""
    q = _unpack_gptq_qweight(qweight, bits)  # [K, N] codes
    z = _unpack_cols(qzeros, bits, awq=False)  # [G, N]
    s = scales.astype(np.float32)  # [G, N]
    k, n = q.shape
    g = s.shape[0]
    group = k // g
    if g_idx is not None and not _is_trivial_g_idx(g_idx, group):
        # act-order checkpoints interleave groups along K; the planar layout
        # needs contiguous groups, so callers should dequantize (see
        # `dequant_gptq_act_order`) and re-quantize via ISQ.
        raise NotImplementedError(
            "GPTQ act-order (non-trivial g_idx): use dequant_gptq_act_order()"
            " + ISQ instead"
        )
    zero = z.astype(np.float32) + float(zero_offset)
    # planar: value = scale * code + bias, bias = -scale * zero
    bias = (-s * zero).astype(np.float32)
    planar = PlanarQuant(
        q=np.ascontiguousarray(q.T).reshape(-1),  # [N, K] row-major flat
        scale=np.ascontiguousarray(s.T).reshape(-1),
        bias=np.ascontiguousarray(bias.T).reshape(-1),
        group_size=group,
        code_bits=bits,
        signed=False,
    )
    return QTensor.from_planar(planar, (n, k), chunks=chunks)


def _is_trivial_g_idx(g_idx: np.ndarray, group: int) -> bool:
    return bool(np.all(g_idx == (np.arange(g_idx.shape[0]) // group)))


def awq_to_qtensor(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
    chunks: int = 1,
) -> QTensor:
    """Decode an AWQ layer (K-major storage, N-packed int32) to QTensor [N, K]."""
    if bits != 4:
        raise NotImplementedError("AWQ is 4-bit")
    q = _unpack_cols(qweight, bits, awq=True)  # [K, N]
    z = _unpack_cols(qzeros, bits, awq=True)  # [G, N]
    s = scales.astype(np.float32)  # [G, N]
    k, n = q.shape
    group = k // s.shape[0]
    bias = (-s * z.astype(np.float32)).astype(np.float32)
    planar = PlanarQuant(
        q=np.ascontiguousarray(q.T).reshape(-1),
        scale=np.ascontiguousarray(s.T).reshape(-1),
        bias=np.ascontiguousarray(bias.T).reshape(-1),
        group_size=group,
        code_bits=bits,
        signed=False,
    )
    return QTensor.from_planar(planar, (n, k), chunks=chunks)


def dequant_gptq_reference(qweight, qzeros, scales, bits=4, zero_offset=1):
    """Straight-line reference dequant (for tests): returns [K, N] f32."""
    q = _unpack_gptq_qweight(qweight, bits).astype(np.float32)
    z = _unpack_cols(qzeros, bits, awq=False).astype(np.float32)
    s = scales.astype(np.float32)
    k = q.shape[0]
    group = k // s.shape[0]
    gi = np.arange(k) // group
    return s[gi] * (q - (z[gi] + zero_offset))


def dequant_gptq_act_order(qweight, qzeros, scales, g_idx, bits=4, zero_offset=1):
    """Dense dequant honoring a non-trivial g_idx. Returns [K, N] f32."""
    q = _unpack_gptq_qweight(qweight, bits).astype(np.float32)
    z = _unpack_cols(qzeros, bits, awq=False).astype(np.float32)
    s = scales.astype(np.float32)
    gi = np.asarray(g_idx)
    return s[gi] * (q - (z[gi] + zero_offset))


def dequant_awq_reference(qweight, qzeros, scales):
    q = _unpack_cols(qweight, 4, awq=True).astype(np.float32)
    z = _unpack_cols(qzeros, 4, awq=True).astype(np.float32)
    s = scales.astype(np.float32)
    k = q.shape[0]
    group = k // s.shape[0]
    gi = np.arange(k) // group
    return s[gi] * (q - z[gi])
