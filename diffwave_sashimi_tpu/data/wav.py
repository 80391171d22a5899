"""Minimal WAV I/O (scipy-backed) shared by the data layer and runtimes.

Scale conventions follow the reference: files store int16 PCM; model-side
audio is float in [-1, 1] via /32768 (reference dataloaders/mel2samp.py:59,
sc.py:46-64); generated audio is written back as int16 (reference
generate.py:188-192 uses scipy wavwrite on int16)."""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.io import wavfile

MAX_WAV_VALUE = 32768.0


def load_wav_raw(path: str) -> Tuple[np.ndarray, int]:
    """(audio float32 at int16 scale (+-32768), sample_rate).  Stereo is
    reduced to the first channel (the reference datasets are mono)."""
    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.int16:
        audio = data.astype(np.float32)
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 65536.0
    elif data.dtype in (np.float32, np.float64):
        audio = (data * MAX_WAV_VALUE).astype(np.float32)
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) * 256.0
    else:
        raise ValueError(f"unsupported wav dtype {data.dtype} in {path}")
    return audio, int(sr)


def load_wav_float(path: str) -> Tuple[np.ndarray, int]:
    """(audio float32 in [-1, 1], sample_rate)."""
    audio, sr = load_wav_raw(path)
    return audio / MAX_WAV_VALUE, sr


def save_wav(path: str, sr: int, audio: np.ndarray) -> None:
    """Write audio as-is: float arrays become IEEE-float32 WAV, exactly like
    the reference's raw scipy wavwrite of the generated float tensor
    (reference generate.py:188-192); int16 passes through as PCM."""
    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        audio = audio.astype(np.float32)
    wavfile.write(path, int(sr), audio)


__all__ = ["MAX_WAV_VALUE", "load_wav_raw", "load_wav_float", "save_wav"]
