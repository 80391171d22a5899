"""Mel2Samp: LJSpeech-style (mel, audio) pairs for vocoder training.

Reference semantics (reference dataloaders/mel2samp.py:59-152):
- file list is every ``*.wav`` under ``data_path``, shuffled once with a
  fixed seed (``random.seed(1234)``; mel2samp.py:66-68);
- training mode returns a random ``segment_length`` crop (zero-padded if
  the utterance is shorter), mel computed from the normalized crop;
- ``valid`` mode returns whole utterances;
- loading a file whose sample rate differs from the configured one raises
  (mel2samp.py:55-57);
- the ``__main__`` CLI precomputes spectrograms for a directory
  (mel2samp.py:121-152) — here saved as ``<name>.wav.npy`` next to a
  ``.pt``-compatible torch fallback on load.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np

from .stft import TacotronSTFT
from .wav import MAX_WAV_VALUE, load_wav_raw


class Mel2Samp:
    def __init__(self, data_path: str, segment_length: int = 16000,
                 filter_length: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, sampling_rate: int = 22050,
                 mel_fmin: float = 0.0, mel_fmax: Optional[float] = 8000.0,
                 valid: bool = False, n_mel_channels: int = 80,
                 seed: int = 1234, **_ignored):
        files = sorted(glob.glob(os.path.join(data_path, "*.wav")))
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(files))
        self.files = [files[i] for i in order]
        self.segment_length = int(segment_length)
        self.sampling_rate = int(sampling_rate)
        self.hop_length = int(hop_length)
        self.valid = bool(valid)
        self.stft = TacotronSTFT(filter_length, hop_length, win_length,
                                 n_mel_channels, sampling_rate,
                                 mel_fmin, mel_fmax)
        self._rng = np.random.RandomState(seed + 1)

    def __len__(self) -> int:
        return len(self.files)

    def path(self, idx: int) -> str:
        return self.files[idx]

    def _load(self, path: str) -> np.ndarray:
        audio, sr = load_wav_raw(path)
        if sr != self.sampling_rate:
            raise ValueError(
                f"{path} SR {sr} doesn't match target SR "
                f"{self.sampling_rate}")          # ref mel2samp.py:55-57
        return audio

    def get_mel(self, audio: np.ndarray) -> np.ndarray:
        """Raw-scale (+-32768) audio (L,) -> log-mel (80, frames)
        (ref mel2samp.py:78-84)."""
        audio_norm = np.asarray(audio, np.float32) / MAX_WAV_VALUE
        return self.stft.mel_spectrogram(audio_norm[None, :])[0]

    def crop(self, audio: np.ndarray,
             start: Optional[int] = None) -> np.ndarray:
        L = self.segment_length
        if len(audio) >= L:
            if start is None:
                start = int(self._rng.randint(0, len(audio) - L + 1))
            return audio[start:start + L]
        return np.pad(audio, (0, L - len(audio)))

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        audio = self._load(self.files[idx])
        if not self.valid:
            audio = self.crop(audio)              # ref mel2samp.py:96-103
        audio_norm = (audio / MAX_WAV_VALUE).astype(np.float32)
        mel = self.stft.mel_spectrogram(audio_norm[None, :])[0]
        return mel, audio_norm[None, :]


def mel_file_path(output_dir: str, wav_path: str) -> str:
    return os.path.join(output_dir, os.path.basename(wav_path) + ".npy")


def load_mel_file(path: str) -> np.ndarray:
    """Load a precomputed spectrogram saved by the CLI below.  ``path`` is
    the ``<dir>/<name>.wav`` convention of the reference's mel_path flag
    (reference generate.py:136-142); we look for ``.npy`` first and fall
    back to a torch ``.pt`` (reference-precomputed spectrograms)."""
    npy = path + ".npy"
    if os.path.exists(npy):
        return np.load(npy)
    for cand in (path.replace(".wav", ".pt"), path + ".pt", path):
        if os.path.exists(cand):
            import torch
            t = torch.load(cand, map_location="cpu", weights_only=False)
            return np.asarray(t, np.float32)
    raise FileNotFoundError(f"no precomputed mel at {path}[.npy|.pt]")


def main(overrides=None) -> int:
    """CLI: precompute spectrograms for every wav in the dataset
    (reference ``python -m dataloaders.mel2samp ... +output_dir=...``,
    mel2samp.py:121-152)."""
    from ..config import load_config
    cfg = load_config(overrides=overrides)
    output_dir = cfg["output_dir"]
    os.makedirs(output_dir, mode=0o775, exist_ok=True)
    ds_cfg = {k: v for k, v in dict(cfg.dataset).items() if k != "_name_"}
    ds = Mel2Samp(valid=True, **{k: v for k, v in ds_cfg.items()
                                 if k != "valid"})
    for path in ds.files:
        audio = ds._load(path)
        mel = ds.get_mel(audio)
        out = mel_file_path(output_dir, path)
        np.save(out, mel)
        print(f"{path} -> {out} {mel.shape}", flush=True)
    return len(ds.files)


if __name__ == "__main__":
    import sys
    main(sys.argv[1:])
