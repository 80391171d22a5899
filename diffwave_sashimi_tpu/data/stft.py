"""STFT / mel-spectrogram pipeline, numpy, librosa-free.

Reimplements the reference's Tacotron2 STFT stack (reference
dataloaders/stft.py:100-244) from the underlying math instead of the
conv1d-with-Fourier-basis formulation: the reference builds an explicit
DFT basis matrix, windows it, and runs conv1d with stride=hop
(stft.py:110-163); that is exactly frame -> window -> rfft, which is what
we compute (verified against the conv formulation in
tests/test_data.py::test_stft_matches_reference_conv_formulation).

The mel filterbank is the Slaney-style bank librosa produces with
norm='slaney', htk=False (the reference calls librosa_mel_fn,
stft.py:208-210) — reimplemented from the Slaney Auditory Toolbox
definition, no librosa dependency.

Also provides istft + Griffin-Lim (window-sumsquare overlap-add, the same
normalization the reference's inverse transform uses, stft.py:165-199) —
used by utils/audio_metrics and offline inspection tools.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, matching scipy.signal.get_window
    ("hann", n, fftbins=True) used by the reference (stft.py:116)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)) \
        .astype(np.float32)


def _padded_window(n_fft: int, win_length: int) -> np.ndarray:
    """Window of win_length center-padded to n_fft (librosa pad_center)."""
    w = hann_window(win_length)
    if win_length == n_fft:
        return w
    assert win_length < n_fft, (win_length, n_fft)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, np.float32)
    out[lpad:lpad + win_length] = w
    return out


def _frame(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(B, L) -> (B, n_frames, n_fft) with reflect padding of n_fft//2 on
    both sides (the reference's F.pad(..., mode='reflect'), stft.py:141-147)."""
    pad = n_fft // 2
    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    L = x.shape[-1]
    n_frames = 1 + (L - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]                      # (B, n_frames, n_fft)


def stft_complex(audio: np.ndarray, n_fft: int, hop: int,
                 win_length: int) -> np.ndarray:
    """(B, L) float -> complex spectrogram (B, n_fft//2+1, n_frames)."""
    frames = _frame(np.asarray(audio, np.float32), n_fft, hop)
    spec = np.fft.rfft(frames * _padded_window(n_fft, win_length), axis=-1)
    return np.swapaxes(spec, -1, -2)        # (B, bins, frames)


def stft_magnitude(audio: np.ndarray, n_fft: int, hop: int,
                   win_length: int) -> np.ndarray:
    """Magnitude STFT, identical to the reference conv1d formulation
    (reference stft.py:135-163)."""
    return np.abs(stft_complex(audio, n_fft, hop, win_length)) \
        .astype(np.float32)


def _window_sumsquare(n_fft: int, hop: int, win_length: int,
                      n_frames: int) -> np.ndarray:
    w2 = _padded_window(n_fft, win_length) ** 2
    out = np.zeros((n_frames - 1) * hop + n_fft, np.float32)
    for t in range(n_frames):
        out[t * hop:t * hop + n_fft] += w2
    return out


def istft(magnitude: np.ndarray, phase: np.ndarray, n_fft: int, hop: int,
          win_length: int) -> np.ndarray:
    """Inverse STFT with window-sumsquare normalization (reference
    stft.py:165-199), reflect-pad trimmed.  (B, bins, T) -> (B, L)."""
    spec = magnitude * np.exp(1j * phase)
    frames = np.fft.irfft(np.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * _padded_window(n_fft, win_length)
    B, T, _ = frames.shape
    y = np.zeros((B, (T - 1) * hop + n_fft), np.float32)
    for t in range(T):
        y[:, t * hop:t * hop + n_fft] += frames[:, t]
    wss = _window_sumsquare(n_fft, hop, win_length, T)
    nz = wss > 1e-10
    y[:, nz] /= wss[nz]
    pad = n_fft // 2
    return y[:, pad:-pad] if pad else y


def griffin_lim(magnitude: np.ndarray, n_fft: int, hop: int,
                win_length: int, n_iters: int = 30,
                seed: int = 0) -> np.ndarray:
    """Phase reconstruction by alternating projections (Griffin & Lim 1984),
    the standard inspection tool for mel/mag-only artifacts."""
    rng = np.random.RandomState(seed)
    phase = rng.uniform(-np.pi, np.pi, magnitude.shape).astype(np.float32)
    y = istft(magnitude, phase, n_fft, hop, win_length)
    for _ in range(n_iters):
        spec = stft_complex(y, n_fft, hop, win_length)
        T = min(spec.shape[-1], magnitude.shape[-1])
        phase = np.angle(spec[..., :T])
        y = istft(magnitude[..., :T], phase, n_fft, hop, win_length)
    return y


# ---------------- Slaney mel filterbank ----------------

def _hz_to_mel(f):
    """Slaney mel scale (librosa htk=False): linear below 1 kHz,
    logarithmic above."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@lru_cache(maxsize=8)
def _mel_filterbank_cached(sr: int, n_fft: int, n_mels: int,
                           fmin: float, fmax: float) -> np.ndarray:
    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax),
                                   n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each triangle integrates to ~1 over Hz
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: Optional[float]) -> np.ndarray:
    """(n_mels, n_fft//2+1) Slaney-normalized triangular mel bank —
    librosa.filters.mel(htk=False, norm='slaney') equivalent (the bank the
    reference builds at dataloaders/stft.py:208-210)."""
    if fmax is None:
        fmax = sr / 2.0
    return _mel_filterbank_cached(int(sr), int(n_fft), int(n_mels),
                                  float(fmin), float(fmax))


def dynamic_range_compression(x: np.ndarray, clip_val: float = 1e-5
                              ) -> np.ndarray:
    """log(clamp(x, 1e-5)) (reference stft.py:222-227 / audio_processing)."""
    return np.log(np.clip(x, clip_val, None)).astype(np.float32)


class TacotronSTFT:
    """Mel-spectrogram front end (reference dataloaders/stft.py:201-244):
    magnitude STFT -> Slaney mel bank -> log dynamic-range compression."""

    def __init__(self, filter_length: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, n_mel_channels: int = 80,
                 sampling_rate: int = 22050, mel_fmin: float = 0.0,
                 mel_fmax: Optional[float] = 8000.0):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.mel_basis = mel_filterbank(sampling_rate, filter_length,
                                        n_mel_channels, mel_fmin, mel_fmax)

    def mel_spectrogram(self, audio: np.ndarray) -> np.ndarray:
        """(B, L) float in [-1, 1] -> (B, n_mels, n_frames) log-mel."""
        audio = np.asarray(audio, np.float32)
        assert audio.ndim == 2, audio.shape
        mag = stft_magnitude(audio, self.filter_length, self.hop_length,
                             self.win_length)
        mel = np.einsum("mf,bft->bmt", self.mel_basis, mag)
        return dynamic_range_compression(mel)


__all__ = ["TacotronSTFT", "mel_filterbank", "stft_magnitude",
           "stft_complex", "istft", "griffin_lim", "hann_window",
           "dynamic_range_compression"]
