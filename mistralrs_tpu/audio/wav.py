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
