"""HQQ — Half-Quadratic Quantization (the analog of
`mistralrs-quant/src/hqq/`, optimizer in `hqq/optimize.rs`).

Group-wise affine quantization whose zero-points are refined by a proximal
half-quadratic solver minimizing ``||W - deq||_p`` with p<1 (robust norm),
following the published HQQ method. Produces the same planar decomposition
as every other format: value = scale * code + bias.
"""

from __future__ import annotations

import numpy as np

from ..gguf.planar import PlanarQuant
from .qtensor import QTensor


def _shrink_lp(x: np.ndarray, beta: float, p: float) -> np.ndarray:
    """Generalized soft-threshold for the l_p (p<1) proximal step."""
    return np.sign(x) * np.maximum(
        np.abs(x) - (1.0 / beta) * np.power(np.abs(x) + 1e-8, p - 1.0), 0.0
    )


def hqq_quantize(
    w: np.ndarray,
    bits: int = 4,
    group_size: int = 64,
    iters: int = 20,
    lp_norm: float = 0.7,
    beta: float = 10.0,
    kappa: float = 1.01,
    chunks: int = 1,
) -> QTensor:
    """Quantize [N, K] to HQQ planar form with optimizer-refined zeros."""
    w = np.asarray(w, np.float32)
    n, k = w.shape
    if k % group_size:
        raise ValueError(f"K={k} not divisible by group {group_size}")
    g = w.reshape(-1, group_size)  # [n*k/gs, gs]
    maxq = (1 << bits) - 1
    wmin = g.min(axis=1, keepdims=True)
    wmax = g.max(axis=1, keepdims=True)
    scale = (wmax - wmin) / maxq
    scale = np.where(scale == 0, 1e-8, scale)
    zero = -wmin / scale  # code-space zero point

    # half-quadratic refinement of `zero` (HQQ Algorithm 1)
    b = beta
    for _ in range(iters):
        q = np.clip(np.round(g / scale + zero), 0, maxq)
        wq = (q - zero) * scale
        e = _shrink_lp(g - wq, b, lp_norm)
        zero = np.mean(q - (g - e) / scale, axis=1, keepdims=True)
        b *= kappa

    q = np.clip(np.round(g / scale + zero), 0, maxq).astype(np.uint8)
    # planar: value = scale*code + bias with bias = -scale*zero
    bias = (-scale * zero).astype(np.float32)
    planar = PlanarQuant(
        q=q.reshape(n, k).reshape(-1),
        scale=np.repeat(scale[:, 0], 1).astype(np.float32),
        bias=bias[:, 0],
        group_size=group_size,
        code_bits=bits,
        signed=False,
    )
    return QTensor.from_planar(planar, (n, k), chunks=chunks)


def hqq_from_state(
    w_q: np.ndarray,  # packed or unpacked codes
    scale: np.ndarray,
    zero: np.ndarray,
    shape: tuple[int, int],
    bits: int = 4,
    group_size: int = 64,
    chunks: int = 1,
) -> QTensor:
    """Build a QTensor from saved HQQ state (hqq-lib convention:
    W ≈ (W_q - zero) * scale, group-wise along the flattened weight)."""
    n, k = shape
    q = np.asarray(w_q, np.uint8).reshape(-1)
    s = np.asarray(scale, np.float32).reshape(-1)
    z = np.asarray(zero, np.float32).reshape(-1)
    bias = -s * z
    planar = PlanarQuant(
        q=q, scale=s, bias=bias, group_size=group_size, code_bits=bits, signed=False
    )
    return QTensor.from_planar(planar, (n, k), chunks=chunks)
