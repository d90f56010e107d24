"""Minimal WAV writer — the analog of the reference's
`speech_models/utils.rs` PCM output (16-bit mono)."""

from __future__ import annotations

import struct

import numpy as np


def write_wav(path, samples: np.ndarray, sample_rate: int = 44100) -> None:
    """samples: float array in [-1, 1] → 16-bit PCM mono WAV.

    ``path`` may be a filesystem path or a binary file-like object."""
    pcm = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()

    def dump(f):
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(pcm)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(pcm)))
        f.write(pcm)

    if hasattr(path, "write"):
        dump(path)
    else:
        with open(path, "wb") as f:
            dump(f)


def read_wav(data_or_path) -> tuple[np.ndarray, int]:
    """WAV bytes/path → (float32 mono waveform in [-1, 1], sample_rate)."""
    import io
    import wave

    src = io.BytesIO(data_or_path) if isinstance(data_or_path, (bytes, bytearray)) else data_or_path
    with wave.open(src, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def resample_linear(x: np.ndarray, rate: int, target: int) -> np.ndarray:
    """Cheap linear resampling (serving input normalization to 16 kHz)."""
    if rate == target:
        return x
    n_out = int(round(len(x) * target / rate))
    pos = np.linspace(0, len(x) - 1, n_out)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, len(x) - 1)
    frac = (pos - lo).astype(np.float32)
    return x[lo] * (1 - frac) + x[hi] * frac
