"""Bit-exact numpy reference (de)quantization for GGML block formats.

This is the host-side ground truth the Pallas kernels are validated against,
and the quantizer used by the ISQ pass. Dequantization is spec-exact
(semantics cross-checked against the reference's CUDA unpack logic,
`mistralrs-quant/kernels/gguf_affine_packed/marlin_gguf_affine_repack.cu:140-275`
and block structs `mistralrs-quant/kernels/mmq_gguf/mmq_common.cuh:141-193`);
quantization follows llama.cpp's algorithms (abs-max for Q8_0/Q4_0-family,
weighted grid search for the k-quant super-blocks).

All functions operate on 2-D uint8 views of shape ``[n_blocks, type_size]``
and float32 arrays of shape ``[n_blocks, block_size]``.
"""

from __future__ import annotations

import numpy as np

from .constants import GGMLType, QK_K, type_traits

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _f16(b: np.ndarray) -> np.ndarray:
    """View a [n, 2] uint8 slice as little-endian float16 -> float32 [n, 1]."""
    return np.ascontiguousarray(b).view(np.dtype("<f2")).astype(np.float32)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """roundf() semantics: round half away from zero (numpy rint is banker's)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """llama.cpp nearest_int: round half away from zero, as int32."""
    return _round_half_away(x).astype(np.int32)


def _blocks(raw: np.ndarray, t: GGMLType) -> np.ndarray:
    tr = type_traits(t)
    raw = np.ascontiguousarray(raw, dtype=np.uint8).reshape(-1)
    if raw.size % tr.type_size != 0:
        raise ValueError(f"raw size {raw.size} not divisible by {tr.type_size}")
    return raw.reshape(-1, tr.type_size)


# ---------------------------------------------------------------------------
# dequantization
# ---------------------------------------------------------------------------


def dequant_q4_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_0)
    d = _f16(b[:, 0:2])
    qs = b[:, 2:18]
    q = np.concatenate([qs & 15, qs >> 4], axis=1).astype(np.float32) - 8.0
    return d * q


def dequant_q4_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_1)
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qs = b[:, 4:20]
    q = np.concatenate([qs & 15, qs >> 4], axis=1).astype(np.float32)
    return d * q + m


def _q5_high_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """[n, 4] uint8 -> [n, 32] the j-th bit of the packed u32 (little-endian)."""
    qh = np.ascontiguousarray(qh_bytes).view(np.dtype("<u4")).astype(np.uint32)
    j = np.arange(32, dtype=np.uint32)[None, :]
    return ((qh >> j) & 1).astype(np.uint8)


def dequant_q5_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_0)
    d = _f16(b[:, 0:2])
    hi_bit = _q5_high_bits(b[:, 2:6])
    qs = b[:, 6:22]
    q = np.concatenate([qs & 15, qs >> 4], axis=1) | (hi_bit << 4)
    return d * (q.astype(np.float32) - 16.0)


def dequant_q5_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_1)
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    hi_bit = _q5_high_bits(b[:, 4:8])
    qs = b[:, 8:24]
    q = np.concatenate([qs & 15, qs >> 4], axis=1) | (hi_bit << 4)
    return d * q.astype(np.float32) + m


def dequant_q8_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_0)
    d = _f16(b[:, 0:2])
    q = b[:, 2:34].view(np.int8).astype(np.float32)
    return d * q


def dequant_q8_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_1)
    d = _f16(b[:, 0:2])
    q = b[:, 4:36].view(np.int8).astype(np.float32)
    return d * q


def dequant_q8_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_K)
    d = np.ascontiguousarray(b[:, 0:4]).view(np.dtype("<f4")).astype(np.float32)
    q = b[:, 4 : 4 + QK_K].view(np.int8).astype(np.float32)
    return d * q


def _unpack_scale_min_k4(scales12: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte packed 6-bit (scale, min) pairs of Q4_K/Q5_K.

    Returns (sc, mn), each [n_blocks, 8] uint8. Semantics match
    get_scale_min_k4 (marlin_gguf_affine_repack.cu:200-209).
    """
    s = scales12
    sc = np.empty((s.shape[0], 8), dtype=np.uint8)
    mn = np.empty((s.shape[0], 8), dtype=np.uint8)
    for g in range(4):
        sc[:, g] = s[:, g] & 63
        mn[:, g] = s[:, g + 4] & 63
    for g in range(4, 8):
        sc[:, g] = (s[:, g + 4] & 15) | ((s[:, g - 4] >> 6) << 4)
        mn[:, g] = (s[:, g + 4] >> 4) | ((s[:, g] >> 6) << 4)
    return sc, mn


def _pack_scale_min_k4(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Inverse of _unpack_scale_min_k4. sc/mn: [n, 8] values in [0, 63]."""
    out = np.zeros((sc.shape[0], 12), dtype=np.uint8)
    for g in range(4):
        out[:, g] = (sc[:, g] & 63) | ((sc[:, g + 4] >> 4) << 6)
        out[:, g + 4] = (mn[:, g] & 63) | ((mn[:, g + 4] >> 4) << 6)
        out[:, g + 8] = (sc[:, g + 4] & 15) | ((mn[:, g + 4] & 15) << 4)
    return out


# --- Q4_K -------------------------------------------------------------------

_LOCAL = np.arange(QK_K)
# q extraction index maps (vectorized forms of the per-element CUDA logic)
_Q4K_CHUNK = _LOCAL // 64
_Q4K_POS = _LOCAL % 64
_Q4K_BYTE = _Q4K_CHUNK * 32 + _Q4K_POS % 32
_Q4K_HI = (_Q4K_POS >= 32).astype(np.uint8) * 4  # shift amount: 0 (lo) or 4 (hi)


def _q4k_nibbles(qs: np.ndarray) -> np.ndarray:
    """[n, 128] qs bytes -> [n, 256] 4-bit values in GGUF element order."""
    return (qs[:, _Q4K_BYTE] >> _Q4K_HI[None, :]) & 15


def dequant_q4_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    q = _q4k_nibbles(b[:, 16:144]).astype(np.float32)
    g = _LOCAL // 32
    scale = d * sc.astype(np.float32)[:, g]
    offset = dmin * mn.astype(np.float32)[:, g]
    return scale * q - offset


# --- Q5_K -------------------------------------------------------------------

_Q5K_HI_BYTE = _LOCAL % 32
_Q5K_HI_SHIFT = _LOCAL // 32


def dequant_q5_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    lo = _q4k_nibbles(qs)
    hi = (qh[:, _Q5K_HI_BYTE] >> _Q5K_HI_SHIFT[None, :]) & 1
    q = (lo | (hi << 4)).astype(np.float32)
    g = _LOCAL // 32
    scale = d * sc.astype(np.float32)[:, g]
    offset = dmin * mn.astype(np.float32)[:, g]
    return scale * q - offset


# --- Q6_K -------------------------------------------------------------------

_Q6K_HALF = _LOCAL // 128
_Q6K_POS = _LOCAL % 32
_Q6K_QUARTER = (_LOCAL % 128) // 32
_Q6K_QL_BYTE = _Q6K_HALF * 64 + _Q6K_POS + (_Q6K_QUARTER % 2) * 32
_Q6K_QL_SHIFT = (_Q6K_QUARTER >= 2).astype(np.uint8) * 4
_Q6K_QH_BYTE = _Q6K_HALF * 32 + _Q6K_POS
_Q6K_QH_SHIFT = (_Q6K_QUARTER * 2).astype(np.uint8)


def dequant_q6_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q6_K)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8).astype(np.float32)
    d = _f16(b[:, 208:210])
    lo = (ql[:, _Q6K_QL_BYTE] >> _Q6K_QL_SHIFT[None, :]) & 15
    hi = (qh[:, _Q6K_QH_BYTE] >> _Q6K_QH_SHIFT[None, :]) & 3
    q = (lo | (hi << 4)).astype(np.float32) - 32.0
    g = _LOCAL // 16
    return d * scales[:, g] * q


# --- Q2_K -------------------------------------------------------------------

_Q2K_BYTE = _LOCAL // 128 * 32 + _LOCAL % 32
_Q2K_SHIFT = ((_LOCAL % 128) // 32 * 2).astype(np.uint8)


def dequant_q2_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q2_K)
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    q = ((qs[:, _Q2K_BYTE] >> _Q2K_SHIFT[None, :]) & 3).astype(np.float32)
    g = _LOCAL // 16
    sc = (scales & 15).astype(np.float32)[:, g]
    mn = (scales >> 4).astype(np.float32)[:, g]
    return d * sc * q - dmin * mn


# --- Q3_K -------------------------------------------------------------------

_Q3K_HM_BYTE = _LOCAL % 32
_Q3K_HM_SHIFT = (_LOCAL // 32).astype(np.uint8)


def _unpack_q3k_scales(scales12: np.ndarray) -> np.ndarray:
    """12 packed bytes -> [n, 16] signed 6-bit scales (int32, -32..31 range
    stored as value-32). Matches get_q3_scale (marlin_gguf_affine_repack.cu:212)."""
    s = scales12
    g = np.arange(16)
    lo_idx = np.where(g < 8, g, g - 8)
    lo = np.where(
        (g < 8)[None, :], s[:, lo_idx] & 15, s[:, lo_idx] >> 4
    ).astype(np.int32)
    hi = ((s[:, 8 + g % 4] >> (2 * (g // 4))[None, :]) & 3).astype(np.int32)
    return (lo | (hi << 4)) - 32


def dequant_q3_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q3_K)
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    sc6 = _unpack_q3k_scales(b[:, 96:108]).astype(np.float32)
    d = _f16(b[:, 108:110])
    lo = (qs[:, _Q2K_BYTE] >> _Q2K_SHIFT[None, :]) & 3
    hi = (hmask[:, _Q3K_HM_BYTE] >> _Q3K_HM_SHIFT[None, :]) & 1
    q = (lo | (hi << 2)).astype(np.float32) - 4.0
    g = _LOCAL // 16
    return d * sc6[:, g] * q


# ---------------------------------------------------------------------------
# quantization (llama.cpp-style)
# ---------------------------------------------------------------------------


def quant_q8_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    d = amax / 127.0
    inv_d = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(_nearest_int(x * inv_d), -127, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:34] = q.view(np.uint8)
    return out


def _quant_q4_family(x: np.ndarray, nmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric n-bit quant per 32-block: d = extreme/-2^(b-1) (sign-keeping).

    Returns (d [n,1] f32, q [n,32] uint8 biased by 2^(b-1)).
    """
    half = (nmax + 1) // 2
    idx = np.abs(x).argmax(axis=1)
    ext = x[np.arange(x.shape[0]), idx][:, None]  # signed extreme value
    d = ext / -half
    inv_d = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    q = np.clip(_nearest_int(x * inv_d) + half, 0, nmax).astype(np.uint8)
    return d.astype(np.float32), q


def quant_q4_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    d, q = _quant_q4_family(x, 15)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:18] = q[:, :16] | (q[:, 16:] << 4)
    return out


def quant_q5_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    d, q = _quant_q4_family(x, 31)
    out = np.empty((x.shape[0], 22), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    hi = (q >> 4).astype(np.uint32)
    qh = (hi << np.arange(32, dtype=np.uint32)[None, :]).sum(axis=1, dtype=np.uint64)
    out[:, 2:6] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    lo = q & 15
    out[:, 6:22] = lo[:, :16] | (lo[:, 16:] << 4)
    return out


def _make_qkx2_quants(
    x: np.ndarray, nmax: int, rmin: float = -1.0, rdelta: float = 0.1, nstep: int = 20,
    w: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Affine quant of each row of x to q in [0, nmax] with value = scale*q - min.

    Vectorized port of llama.cpp's make_qkx2_quants grid search. ``w`` is an
    optional per-element importance matrix (the imatrix path: weighted
    least-squares refit + weighted error); None → uniform weights (the
    use_mad=false default).
    Returns (scale [n], neg_min [n], q [n, gs] uint8).
    """
    n, _gs = x.shape
    vmin = x.min(axis=1)
    vmax = x.max(axis=1)
    vmin = np.minimum(vmin, 0.0)
    flat = vmax == vmin
    scale = (vmax - vmin) / nmax
    scale = np.where(flat, 0.0, scale)
    best_q = None
    best_err = np.full(n, np.inf, dtype=np.float64)
    best_scale = scale.copy()
    best_min = -vmin
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    for is_ in range(nstep + 1):
        factor = (rmin + rdelta * is_ + nmax) / nmax
        trial_scale = (vmax - vmin) / nmax * factor
        trial_inv = np.where(
            trial_scale > 0, 1.0 / np.where(trial_scale > 0, trial_scale, 1.0), inv
        )
        q = np.clip(_nearest_int(trial_inv[:, None] * (x - vmin[:, None])), 0, nmax)
        # least-squares refit of (scale, min) given q  (llama.cpp lines: sum_l etc.)
        qf = q.astype(np.float64)
        if w is None:
            sum_l = qf.sum(axis=1)
            sum_l2 = (qf * qf).sum(axis=1)
            sum_xl = (qf * x).sum(axis=1)
            sum_x = x.sum(axis=1).astype(np.float64)
            gs = x.shape[1]
        else:
            wf = w.astype(np.float64)
            sum_l = (wf * qf).sum(axis=1)
            sum_l2 = (wf * qf * qf).sum(axis=1)
            sum_xl = (wf * qf * x).sum(axis=1)
            sum_x = (wf * x).sum(axis=1)
            gs = wf.sum(axis=1)
        D = gs * sum_l2 - sum_l * sum_l
        ok = D > 0
        this_scale = np.where(ok, (gs * sum_xl - sum_x * sum_l) / np.where(D > 0, D, 1), trial_scale)
        this_min = np.where(ok, (sum_l2 * sum_x - sum_l * sum_xl) / np.where(D > 0, D, 1), vmin)
        pos_min = this_min > 0
        this_min = np.where(pos_min, 0.0, this_min)
        this_scale = np.where(
            pos_min & ok & (sum_l2 > 0), sum_xl / np.where(sum_l2 > 0, sum_l2, 1), this_scale
        )
        recon = this_scale[:, None] * qf + this_min[:, None]
        if w is None:
            err = ((recon - x) ** 2).sum(axis=1)
        else:
            err = (w * (recon - x) ** 2).sum(axis=1)
        better = err < best_err
        best_err = np.where(better, err, best_err)
        best_scale = np.where(better, this_scale, best_scale)
        best_min = np.where(better, -this_min, best_min)
        if best_q is None:
            best_q = q.astype(np.uint8)
        else:
            best_q = np.where(better[:, None], q, best_q).astype(np.uint8)
    best_min = np.maximum(best_min, 0.0)
    return best_scale.astype(np.float32), best_min.astype(np.float32), best_q


def _quant_k_affine(
    x: np.ndarray, nmax: int, w: np.ndarray | None = None
) -> tuple[np.ndarray, ...]:
    """Shared Q4_K/Q5_K super-block quantization.

    x: [n_sb, 256]. Returns (d, dmin [n,1] f32; sc6, mn6 [n,8] uint8;
    q [n, 256] uint8 in element order)."""
    n = x.shape[0]
    groups = x.reshape(n * 8, 32)
    gw = None if w is None else w.reshape(n * 8, 32)
    scales, mins, _ = _make_qkx2_quants(groups, nmax, w=gw)
    scales = scales.reshape(n, 8)
    mins = mins.reshape(n, 8)
    max_scale = scales.max(axis=1, keepdims=True)
    max_min = mins.max(axis=1, keepdims=True)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    sc6 = np.clip(_nearest_int(inv_scale * scales), 0, 63).astype(np.uint8)
    mn6 = np.clip(_nearest_int(inv_min * mins), 0, 63).astype(np.uint8)
    d = (max_scale / 63.0).astype(np.float16).astype(np.float32)
    dmin = (max_min / 63.0).astype(np.float16).astype(np.float32)
    # final quantization of elements with the *decoded* 6-bit scales
    eff_scale = d * sc6.astype(np.float32)
    eff_min = dmin * mn6.astype(np.float32)
    g = _LOCAL // 32
    es = eff_scale[:, g]
    em = eff_min[:, g]
    inv_es = np.where(es > 0, 1.0 / np.where(es > 0, es, 1), 0.0)
    q = np.clip(_nearest_int((x + em) * inv_es), 0, nmax).astype(np.uint8)
    return d, dmin, sc6, mn6, q


def _pack_q4k_nibbles(q: np.ndarray) -> np.ndarray:
    """[n, 256] element-order 4-bit values -> [n, 128] packed qs bytes."""
    n = q.shape[0]
    out = np.zeros((n, 128), dtype=np.uint8)
    lo_mask = _Q4K_HI == 0
    np.add.at(out.T, (_Q4K_BYTE[lo_mask]), (q[:, lo_mask] & 15).T)
    np.add.at(out.T, (_Q4K_BYTE[~lo_mask]), ((q[:, ~lo_mask] & 15) << 4).T)
    return out


def quant_q4_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    if w is not None:
        w = np.asarray(w, np.float32).reshape(-1, QK_K)
    d, dmin, sc6, mn6, q = _quant_k_affine(x, 15, w)
    out = np.empty((x.shape[0], 144), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:4] = dmin.astype(np.float16).view(np.uint8)
    out[:, 4:16] = _pack_scale_min_k4(sc6, mn6)
    out[:, 16:144] = _pack_q4k_nibbles(q)
    return out


def quant_q5_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    if w is not None:
        w = np.asarray(w, np.float32).reshape(-1, QK_K)
    d, dmin, sc6, mn6, q = _quant_k_affine(x, 31, w)
    out = np.empty((x.shape[0], 176), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:4] = dmin.astype(np.float16).view(np.uint8)
    out[:, 4:16] = _pack_scale_min_k4(sc6, mn6)
    hi = (q >> 4).astype(np.uint8)
    qh = np.zeros((x.shape[0], 32), dtype=np.uint8)
    np.add.at(
        qh.T,
        _Q5K_HI_BYTE,
        (hi << _Q5K_HI_SHIFT[None, :].astype(np.uint8)).T,
    )
    out[:, 16:48] = qh
    out[:, 48:176] = _pack_q4k_nibbles(q & 15)
    return out


def quant_q6_k(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    n = x.shape[0]
    groups = x.reshape(n, 16, 16)
    # per-group signed scale: extreme/-32, then least-squares refine once
    idx = np.abs(groups).argmax(axis=2)
    ext = np.take_along_axis(groups, idx[:, :, None], axis=2)[:, :, 0]
    s = ext / -32.0
    inv = np.where(s != 0, 1.0 / np.where(s != 0, s, 1), 0.0)
    q = np.clip(_nearest_int(groups * inv[:, :, None]), -32, 31).astype(np.float64)
    num = (q * groups).sum(axis=2)
    den = (q * q).sum(axis=2)
    s = np.where(den > 0, num / np.where(den > 0, den, 1), s).astype(np.float32)
    max_abs = np.abs(s).max(axis=1, keepdims=True)
    d = (max_abs / 127.0).astype(np.float16).astype(np.float32)
    inv_d = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    sc8 = np.clip(_nearest_int(s * inv_d), -128, 127).astype(np.int8)
    eff = d * sc8.astype(np.float32)
    g = _LOCAL // 16
    es = eff[:, g]
    inv_es = np.where(es != 0, 1.0 / np.where(es != 0, es, 1), 0.0)
    q6 = (np.clip(_nearest_int(x * inv_es), -32, 31) + 32).astype(np.uint8)
    out = np.empty((n, 210), dtype=np.uint8)
    lo = q6 & 15
    ql = np.zeros((n, 128), dtype=np.uint8)
    lo_sel = _Q6K_QL_SHIFT == 0
    np.add.at(ql.T, _Q6K_QL_BYTE[lo_sel], lo[:, lo_sel].T)
    np.add.at(ql.T, _Q6K_QL_BYTE[~lo_sel], (lo[:, ~lo_sel] << 4).T)
    qh = np.zeros((n, 64), dtype=np.uint8)
    hi = q6 >> 4
    np.add.at(qh.T, _Q6K_QH_BYTE, (hi << _Q6K_QH_SHIFT[None, :]).T)
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = d.astype(np.float16).view(np.uint8)
    return out


# ---------------------------------------------------------------------------
# dispatch tables
# ---------------------------------------------------------------------------

DEQUANTIZERS = {
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q8_1: dequant_q8_1,
    GGMLType.Q2_K: dequant_q2_k,
    GGMLType.Q3_K: dequant_q3_k,
    GGMLType.Q4_K: dequant_q4_k,
    GGMLType.Q5_K: dequant_q5_k,
    GGMLType.Q6_K: dequant_q6_k,
    GGMLType.Q8_K: dequant_q8_k,
}

def quant_q2_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """Q2_K: 16 sub-blocks of 16, 4-bit scales/mins, 2-bit codes (84 B /
    256). The low-bit end of the ISQ range — the ΔPPL protocol's power
    probe (a format that genuinely degrades shows ordered positive
    deltas)."""
    x = x.reshape(-1, QK_K).astype(np.float32)
    n = x.shape[0]
    groups = x.reshape(n * 16, 16)
    gw = None if w is None else np.asarray(w, np.float32).reshape(n * 16, 16)
    scales, mins, _ = _make_qkx2_quants(groups, 3, w=gw)
    scales = scales.reshape(n, 16)
    mins = mins.reshape(n, 16)
    max_scale = scales.max(axis=1, keepdims=True)
    max_min = mins.max(axis=1, keepdims=True)
    inv_scale = np.where(max_scale > 0, 15.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 15.0 / np.where(max_min > 0, max_min, 1), 0.0)
    sc4 = np.clip(_nearest_int(inv_scale * scales), 0, 15).astype(np.uint8)
    mn4 = np.clip(_nearest_int(inv_min * mins), 0, 15).astype(np.uint8)
    d = (max_scale / 15.0).astype(np.float16).astype(np.float32)
    dmin = (max_min / 15.0).astype(np.float16).astype(np.float32)
    g = _LOCAL // 16
    es = (d * sc4.astype(np.float32))[:, g]
    em = (dmin * mn4.astype(np.float32))[:, g]
    inv_es = np.where(es > 0, 1.0 / np.where(es > 0, es, 1), 0.0)
    q = np.clip(_nearest_int((x + em) * inv_es), 0, 3).astype(np.uint8)
    qs = np.zeros((n, 64), dtype=np.uint8)
    np.add.at(qs.T, _Q2K_BYTE, (q << _Q2K_SHIFT[None, :]).T)
    out = np.empty((n, 84), dtype=np.uint8)
    out[:, 0:16] = sc4 | (mn4 << 4)
    out[:, 16:80] = qs
    out[:, 80:82] = d.astype(np.float16).view(np.uint8)
    out[:, 82:84] = dmin.astype(np.float16).view(np.uint8)
    return out


def quant_q3_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """Q3_K: 16 sub-blocks of 16, signed 6-bit scales, 3-bit symmetric
    codes in −4..3 (110 B / 256)."""
    x = x.reshape(-1, QK_K).astype(np.float32)
    n = x.shape[0]
    groups = x.reshape(n * 16, 16)
    gw = (np.ones_like(groups) if w is None
          else np.asarray(w, np.float32).reshape(n * 16, 16))
    # symmetric per-group scale: amax seed + one weighted LSQ refinement
    amax = np.abs(groups).max(axis=1, keepdims=True)
    s0 = np.where(amax > 0, amax / 4.0, 1.0)
    q0 = np.clip(_nearest_int(groups / s0), -4, 3).astype(np.float32)
    num = (gw * groups * q0).sum(axis=1)
    den = (gw * q0 * q0).sum(axis=1)
    s1 = np.where(den > 0, num / np.where(den > 0, den, 1), s0[:, 0])
    scales = s1.reshape(n, 16)
    max_abs = np.abs(scales).max(axis=1, keepdims=True)
    inv = np.where(max_abs > 0, 31.0 / np.where(max_abs > 0, max_abs, 1), 0.0)
    sc6 = np.clip(_nearest_int(inv * scales), -32, 31).astype(np.int32)
    d = (max_abs / 31.0).astype(np.float16).astype(np.float32)
    g = _LOCAL // 16
    es = (d * sc6.astype(np.float32))[:, g]
    inv_es = np.where(es != 0, 1.0 / np.where(es != 0, es, 1), 0.0)
    q = np.clip(_nearest_int(x * inv_es), -4, 3).astype(np.int32) + 4  # 0..7
    qs = np.zeros((n, 64), dtype=np.uint8)
    np.add.at(qs.T, _Q2K_BYTE, ((q & 3).astype(np.uint8) << _Q2K_SHIFT[None, :]).T)
    hmask = np.zeros((n, 32), dtype=np.uint8)
    np.add.at(hmask.T, _Q3K_HM_BYTE,
              (((q >> 2) & 1).astype(np.uint8) << _Q3K_HM_SHIFT[None, :]).T)
    # pack signed scales (stored as value+32) per _unpack_q3k_scales
    sp = (sc6 + 32).astype(np.uint8)
    scales12 = np.zeros((n, 12), dtype=np.uint8)
    for gi in range(16):
        lo = sp[:, gi] & 15
        hi = (sp[:, gi] >> 4) & 3
        if gi < 8:
            scales12[:, gi] |= lo
        else:
            scales12[:, gi - 8] |= lo << 4
        scales12[:, 8 + gi % 4] |= hi << (2 * (gi // 4))
    out = np.empty((n, 110), dtype=np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = scales12
    out[:, 108:110] = d.astype(np.float16).view(np.uint8)
    return out


QUANTIZERS = {
    GGMLType.Q2_K: quant_q2_k,
    GGMLType.Q3_K: quant_q3_k,
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q4_K: quant_q4_k,
    GGMLType.Q5_K: quant_q5_k,
    GGMLType.Q6_K: quant_q6_k,
}


def dequantize(raw: np.ndarray, t: GGMLType, shape: tuple[int, ...]) -> np.ndarray:
    """Dequantize raw GGUF tensor bytes to float32 with the given shape."""
    if t == GGMLType.F32:
        return np.ascontiguousarray(raw, dtype=np.uint8).view("<f4").reshape(shape).copy()
    if t == GGMLType.F16:
        return (
            np.ascontiguousarray(raw, dtype=np.uint8)
            .view("<f2")
            .astype(np.float32)
            .reshape(shape)
        )
    if t == GGMLType.BF16:
        u16 = np.ascontiguousarray(raw, dtype=np.uint8).view("<u2").astype(np.uint32)
        return (u16 << 16).view(np.float32).reshape(shape)
    fn = DEQUANTIZERS.get(t)
    if fn is None:
        raise NotImplementedError(f"dequantize: {t!r}")
    return fn(raw).reshape(shape)


def quantize(x: np.ndarray, t: GGMLType) -> np.ndarray:
    """Quantize float array (row-major, blocks along the last axis) to raw bytes."""
    if t == GGMLType.F32:
        return x.astype("<f4").view(np.uint8).reshape(-1)
    if t == GGMLType.F16:
        return x.astype("<f2").view(np.uint8).reshape(-1)
    if t == GGMLType.BF16:
        u32 = x.astype(np.float32).view(np.uint32)
        rounded = (u32 + np.uint32(0x7FFF) + ((u32 >> 16) & 1)) >> 16  # RNE
        return rounded.astype("<u2").view(np.uint8).reshape(-1)
    fn = QUANTIZERS.get(t)
    if fn is None:
        raise NotImplementedError(f"quantize: {t!r}")
    return fn(np.asarray(x, dtype=np.float32)).reshape(-1)


def quantize_imatrix(
    x: np.ndarray, t: GGMLType, weights: np.ndarray
) -> np.ndarray:
    """Importance-weighted quantization (the imatrix path, analog of
    llama.cpp/the reference's imatrix-guided ISQ). ``weights`` is a
    per-column importance vector [K] (mean squared activation) broadcast
    over rows, or a full per-element matrix matching ``x``. Only the k-quant
    affine formats refit with weights; other formats fall back to plain
    quantization."""
    x = np.asarray(x, dtype=np.float32)
    w = np.asarray(weights, dtype=np.float32)
    if w.ndim == 1:
        w = np.broadcast_to(w, x.shape)
    w = np.maximum(w, 1e-10)
    if t == GGMLType.Q4_K:
        return quant_q4_k(x, w).reshape(-1)
    if t == GGMLType.Q5_K:
        return quant_q5_k(x, w).reshape(-1)
    return quantize(x, t)
