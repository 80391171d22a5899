"""Waveform fidelity metrics: the BASELINE.md acceptance criteria.

The project's north star requires "waveform fidelity (MSE / spectral
distance) within tolerance of the reference checkpoints' outputs"
(BASELINE.md).  These are the standard comparison metrics:

- waveform MSE / SNR between aligned signals,
- log-mel spectral distance (L2 over log-mel frames — the same Tacotron
  mel pipeline used for vocoder conditioning, so train/eval agree),
- multi-resolution STFT distance (spectral-convergence + log-magnitude,
  the usual vocoder eval).

CLI: ``python -m diffwave_sashimi_tpu.utils.audio_metrics a.wav b.wav``
or two directories of wavs (matched by filename).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional, Tuple

import numpy as np

from ..data.stft import TacotronSTFT, stft_magnitude
from ..data.wav import load_wav_float


def waveform_mse(a: np.ndarray, b: np.ndarray) -> float:
    n = min(a.shape[-1], b.shape[-1])
    return float(np.mean((a[..., :n] - b[..., :n]) ** 2))


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    n = min(ref.shape[-1], est.shape[-1])
    ref, est = ref[..., :n], est[..., :n]
    noise = np.mean((ref - est) ** 2)
    if noise == 0:
        return float("inf")
    return float(10 * np.log10(np.mean(ref ** 2) / noise))


def log_mel_distance(a: np.ndarray, b: np.ndarray, sampling_rate: int,
                     filter_length: int = 1024, hop_length: int = 256,
                     win_length: int = 1024) -> float:
    """L2 distance between log-mel spectrograms (lower is better)."""
    stft = TacotronSTFT(filter_length, hop_length, win_length, 80,
                        sampling_rate, 0.0, sampling_rate / 2.0)
    n = min(a.shape[-1], b.shape[-1])
    ma = stft.mel_spectrogram(np.clip(a[..., :n], -1, 1)[None])
    mb = stft.mel_spectrogram(np.clip(b[..., :n], -1, 1)[None])
    return float(np.sqrt(np.mean((ma - mb) ** 2)))


def multires_stft_distance(a: np.ndarray, b: np.ndarray,
                           resolutions=((512, 128, 512), (1024, 256, 1024),
                                        (2048, 512, 2048))) -> Dict[str, float]:
    """Spectral convergence + log-STFT-magnitude distance, averaged over
    multiple resolutions (standard neural-vocoder evaluation)."""
    n = min(a.shape[-1], b.shape[-1])
    a, b = a[..., :n], b[..., :n]
    sc, lm = [], []
    for n_fft, hop, win in resolutions:
        if n < n_fft:
            continue
        ma = stft_magnitude(a[None], n_fft, hop, win)
        mb = stft_magnitude(b[None], n_fft, hop, win)
        sc.append(np.linalg.norm(ma - mb) / (np.linalg.norm(ma) + 1e-9))
        lm.append(np.mean(np.abs(np.log(ma + 1e-7) - np.log(mb + 1e-7))))
    return {"spectral_convergence": float(np.mean(sc)),
            "log_stft_magnitude": float(np.mean(lm))}


def compare(a: np.ndarray, b: np.ndarray, sampling_rate: int
            ) -> Dict[str, float]:
    out = {"waveform_mse": waveform_mse(a, b),
           "snr_db": snr_db(a, b),
           "log_mel_l2": log_mel_distance(a, b, sampling_rate)}
    out.update(multires_stft_distance(a, b))
    return out


def compare_files(path_a: str, path_b: str) -> Dict[str, float]:
    a, sr_a = load_wav_float(path_a)
    b, sr_b = load_wav_float(path_b)
    assert sr_a == sr_b, f"sample rates differ: {sr_a} vs {sr_b}"
    return compare(a, b, sr_a)


def compare_dirs(dir_a: str, dir_b: str) -> Dict[str, Dict[str, float]]:
    names = sorted(set(os.listdir(dir_a)) & set(os.listdir(dir_b)))
    names = [n for n in names if n.endswith(".wav")]
    return {n: compare_files(os.path.join(dir_a, n), os.path.join(dir_b, n))
            for n in names}


def main(argv=None):
    import json
    args = argv if argv is not None else sys.argv[1:]
    assert len(args) == 2, "usage: audio_metrics <a.wav|dir> <b.wav|dir>"
    a, b = args
    if os.path.isdir(a):
        result = compare_dirs(a, b)
    else:
        result = compare_files(a, b)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
