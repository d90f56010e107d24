"""MXFP4 (OCP microscaling FP4) codec — the analog of the reference's MXFP4
support (`mistralrs-quant/src/mxfp4/`), the format gpt-oss checkpoints ship
their expert banks in.

Layout (per the OCP MX spec and the gpt-oss release):
- values are FP4 E2M1 codes: magnitudes {0, .5, 1, 1.5, 2, 3, 4, 6}, top bit
  sign; two codes per byte, LOW nibble first
- 32-value blocks share an E8M0 scale: a power of two stored as a biased
  uint8 exponent (bias 127)
- checkpoint tensors: ``<name>_blocks`` [..., n_blocks, 16] uint8 and
  ``<name>_scales`` [..., n_blocks] uint8 for a logical [..., n_blocks*32]
  weight

E2M1 is a lookup table, not an affine code, so MXFP4 tensors decode to dense
(bf16) rather than the planar scale*q+bias form; re-quantize with ISQ (Q4_K)
to get the fused-kernel path.
"""

from __future__ import annotations

import numpy as np

FP4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    dtype=np.float32,
)

BLOCK = 32
E8M0_BIAS = 127


def dequantize_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """blocks [..., n_blocks, 16] uint8 + scales [..., n_blocks] uint8 →
    float32 [..., n_blocks * 32]."""
    blocks = np.asarray(blocks, np.uint8)
    scales = np.asarray(scales, np.uint8)
    lo = FP4_VALUES[blocks & 0xF]
    hi = FP4_VALUES[blocks >> 4]
    # interleave: element 2j ← low nibble of byte j, 2j+1 ← high nibble
    vals = np.stack([lo, hi], axis=-1).reshape(*blocks.shape[:-1], BLOCK)
    exp = scales.astype(np.int32) - E8M0_BIAS
    vals = vals * np.exp2(exp)[..., None].astype(np.float32)
    return vals.reshape(*blocks.shape[:-2], blocks.shape[-2] * BLOCK)


def quantize_mxfp4(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """float array [..., K] (K % 32 == 0) → (blocks [..., K/32, 16] uint8,
    scales [..., K/32] uint8). Scale picked as the power of two that maps the
    block absmax into FP4 range (≤ 6)."""
    w = np.asarray(w, np.float32)
    k = w.shape[-1]
    if k % BLOCK:
        raise ValueError(f"MXFP4 needs K % {BLOCK} == 0, got {k}")
    g = w.reshape(*w.shape[:-1], k // BLOCK, BLOCK)
    absmax = np.abs(g).max(axis=-1)
    with np.errstate(divide="ignore"):
        exp = np.ceil(np.log2(np.maximum(absmax, 1e-30) / 6.0))
    exp = np.clip(exp, -E8M0_BIAS, 254 - E8M0_BIAS).astype(np.int32)
    exp = np.where(absmax == 0, 0, exp)
    scaled = g / np.exp2(exp)[..., None]
    # nearest FP4 code (ties resolved toward the first/lower magnitude)
    dist = np.abs(scaled[..., None] - FP4_VALUES[None])
    codes = np.argmin(dist, axis=-1).astype(np.uint8)
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    blocks = (lo | (hi << 4)).astype(np.uint8)
    scales = (exp + E8M0_BIAS).astype(np.uint8)
    return blocks, scales


def decode_mxfp4_param(sd, stem: str):
    """Decode ``<stem>_blocks``/``<stem>_scales`` from a state dict, or None.

    Returns float32 with the blocks' logical layout [..., K]."""
    blocks = sd.get(stem + "_blocks")
    scales = sd.get(stem + "_scales")
    if blocks is None or scales is None:
        return None
    return dequantize_mxfp4(np.asarray(blocks), np.asarray(scales))
