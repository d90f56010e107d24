"""Whisper-style log-mel spectrogram frontend — the analog of the
reference's `voxtral/audio_processing.rs` (no HF feature extractors at
serving time). Matches transformers' WhisperFeatureExtractor numerically:
Hann window, n_fft 400, hop 160, Slaney-normalized mel filterbank, log10
with max-8dB flooring and (x+4)/4 scaling."""

from __future__ import annotations

import numpy as np


def _hertz_to_mel(freq):
    freq = np.asarray(freq, np.float64)
    min_log_hertz, min_log_mel = 1000.0, 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep,
        mels,
    )


def _mel_to_hertz(mels):
    mels = np.asarray(mels, np.float64)
    min_log_hertz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        min_log_hertz * np.exp(logstep * (mels - min_log_mel)),
        freq,
    )


def mel_filter_bank(
    num_frequency_bins: int, num_mel_filters: int, min_frequency: float,
    max_frequency: float, sampling_rate: int,
) -> np.ndarray:
    """Slaney-norm triangular filters [num_frequency_bins, num_mel_filters]
    (transformers.audio_utils.mel_filter_bank with norm='slaney',
    mel_scale='slaney')."""
    mel_min = _hertz_to_mel(min_frequency)
    mel_max = _hertz_to_mel(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz(mel_freqs)
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0, np.minimum(down, up))
    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    return (fb * enorm[None]).astype(np.float32)


def log_mel_spectrogram(
    audio: np.ndarray,  # [T] float waveform at `sampling_rate`
    *,
    sampling_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    num_mel_bins: int = 128,
    pad_to_samples: int | None = None,
) -> np.ndarray:
    """→ [num_mel_bins, T/hop] log-mel features (WhisperFeatureExtractor
    parity; pad_to_samples pads/truncates the waveform first — voxtral pads
    to whole 30 s chunks)."""
    audio = np.asarray(audio, np.float64)
    if pad_to_samples is not None:
        if len(audio) < pad_to_samples:
            audio = np.pad(audio, (0, pad_to_samples - len(audio)))
        else:
            audio = audio[:pad_to_samples]
    window = np.hanning(n_fft + 1)[:-1]
    # reflect-pad n_fft//2 both sides (torch.stft center=True)
    pad = n_fft // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = x[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2  # [F, bins]
    spec = spec[:-1]  # whisper drops the last frame
    fb = mel_filter_bank(
        n_fft // 2 + 1, num_mel_bins, 0.0, 8000.0, sampling_rate
    ).astype(np.float64)
    mel = spec @ fb  # [F, mel]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T.astype(np.float32)  # [mel, F]
