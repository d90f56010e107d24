"""BS.1770-4 loudness: sine-tone sanity, gating behavior, normalization."""

import numpy as np

from mistralrs_tpu.audio.bs1770 import integrated_loudness, normalize_loudness


def _sine(freq, amp, seconds, rate):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_sine_loudness_reference_value():
    """997 Hz full-scale sine ≈ −3.01 LUFS + K-weight ≈ 0 dB at 1 kHz:
    the BS.1770 spec's own calibration point (±0.5 LU)."""
    x = _sine(997.0, 1.0, 2.0, 48000)
    loud = integrated_loudness(x, 48000)
    assert abs(loud - (-3.01)) < 0.5, loud


def test_low_frequency_attenuated():
    """The K-weighting high-pass (f0≈38 Hz, 2nd order) attenuates rumble:
    ~9 dB at 30 Hz, >20 dB at 10 Hz."""
    ref = integrated_loudness(_sine(997.0, 0.5, 2.0, 48000), 48000)
    low30 = integrated_loudness(_sine(30.0, 0.5, 2.0, 48000), 48000)
    low10 = integrated_loudness(_sine(10.0, 0.5, 4.0, 48000), 48000)
    assert 6.0 < ref - low30 < 13.0
    assert ref - low10 > 20.0


def test_gating_ignores_silence():
    """Appending silence must not change integrated loudness (gated)."""
    rate = 24000
    x = _sine(997.0, 0.25, 1.0, rate)
    padded = np.concatenate([x, np.zeros(rate * 3, np.float32)])
    a = integrated_loudness(x, rate)
    b = integrated_loudness(padded, rate)
    # blocks straddling the tone/silence edge pass the gate at lower power,
    # so a small (≲1 LU) shift is correct BS.1770 behavior
    assert abs(a - b) < 1.0, (a, b)


def test_normalize_to_target():
    x = _sine(997.0, 0.05, 1.5, 24000)
    y = normalize_loudness(x, 24000, target_lufs=-14.0)
    assert abs(integrated_loudness(y, 24000) - (-14.0)) < 0.3


def test_silence_passthrough():
    x = np.zeros(24000, np.float32)
    y = normalize_loudness(x, 24000)
    assert np.array_equal(y, x)
