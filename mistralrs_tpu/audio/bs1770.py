"""ITU-R BS.1770-4 loudness measurement + normalization — the analog of the
reference's `mistralrs-core/src/speech_models/{bs1770.rs,utils.rs}`
(TTS output is normalized to −14 LUFS before WAV encoding).

Implements the standard's K-weighting (stage-1 high shelf + stage-2
high-pass biquads with coefficients re-derived for the actual sample rate)
and 400 ms / 75 %-overlap gated integrated loudness (−70 LKFS absolute
gate, −10 LU relative gate).
"""

from __future__ import annotations

import math

import numpy as np


def _k_weighting_coeffs(rate: int):
    """(stage1 b, a), (stage2 b, a) biquad coefficients at `rate`."""
    # stage 1: spherical-head high shelf (BS.1770 Annex; parameterization
    # per the widely used pyloudnorm/ruuda derivation)
    f0, g_db, q = 1681.9744509555319, 3.999843853973347, 0.7071752369554196
    k = math.tan(math.pi * f0 / rate)
    vh = 10.0 ** (g_db / 20.0)
    vb = vh ** 0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b1 = [(vh + vb * k / q + k * k) / a0,
          2.0 * (k * k - vh) / a0,
          (vh - vb * k / q + k * k) / a0]
    a1 = [1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0]
    # stage 2: high-pass
    f0, q = 38.13547087602444, 0.5003270373238773
    k = math.tan(math.pi * f0 / rate)
    den = 1.0 + k / q + k * k
    b2 = [1.0, -2.0, 1.0]  # unity passband gain at Nyquist by convention
    a2 = [1.0, 2.0 * (k * k - 1.0) / den, (1.0 - k / q + k * k) / den]
    return (np.array(b1), np.array(a1)), (np.array(b2), np.array(a2))


def _biquad(x: np.ndarray, b, a) -> np.ndarray:
    """Direct-form transposed-II biquad (float64)."""
    try:
        from scipy.signal import lfilter  # vectorized when available

        return lfilter(np.asarray(b, np.float64), np.asarray(a, np.float64),
                       np.asarray(x, np.float64))
    except ImportError:
        pass
    y = np.empty_like(x, dtype=np.float64)
    z1 = z2 = 0.0
    b0, b1, b2 = float(b[0]), float(b[1]), float(b[2])
    a1, a2 = float(a[1]), float(a[2])
    for i, xi in enumerate(x.astype(np.float64)):
        yi = b0 * xi + z1
        z1 = b1 * xi - a1 * yi + z2
        z2 = b2 * xi - a2 * yi
        y[i] = yi
    return y


def k_weighted(x: np.ndarray, rate: int) -> np.ndarray:
    (b1, a1), (b2, a2) = _k_weighting_coeffs(rate)
    return _biquad(_biquad(np.asarray(x, np.float64), b1, a1), b2, a2)


def integrated_loudness(x: np.ndarray, rate: int) -> float:
    """Gated integrated loudness of a mono signal, in LUFS (−inf if the
    signal never crosses the absolute gate)."""
    y = k_weighted(x, rate)
    win = int(round(0.4 * rate))
    hop = win // 4  # 75 % overlap
    if len(y) < win:
        y = np.pad(y, (0, win - len(y)))
    n_blocks = 1 + (len(y) - win) // hop
    powers = np.array([
        np.mean(y[i * hop : i * hop + win] ** 2) for i in range(n_blocks)
    ])
    loud = -0.691 + 10.0 * np.log10(np.maximum(powers, 1e-30))
    keep = powers[loud > -70.0]
    if keep.size == 0:
        return float("-inf")
    rel_gate = -0.691 + 10.0 * np.log10(keep.mean()) - 10.0
    keep2 = powers[(loud > -70.0) & (loud > rel_gate)]
    if keep2.size == 0:
        return float("-inf")
    return float(-0.691 + 10.0 * np.log10(keep2.mean()))


def normalize_loudness(
    x: np.ndarray, rate: int, *, target_lufs: float = -14.0,
    compressor: bool = False,
) -> np.ndarray:
    """Gain the signal to the target integrated loudness (the reference's
    `normalize_loudness`: −14 LUFS, optional tanh soft limiter)."""
    loud = integrated_loudness(x, rate)
    if not math.isfinite(loud):
        return np.asarray(x, np.float32)
    gain = 10.0 ** ((target_lufs - loud) / 20.0)
    out = np.asarray(x, np.float64) * gain
    if compressor:
        out = np.tanh(out)
    return out.astype(np.float32)
