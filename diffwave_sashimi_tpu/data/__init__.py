"""Data layer: datasets, STFT/mel front end, loader, native decode.

TPU-native redesign of the reference ``dataloaders/`` package (reference
dataloaders/__init__.py, sc.py, mel2samp.py, stft.py): numpy/scipy only on
the Python side, a native multithreaded batch decoder replacing worker
processes, and replica sharding expressed directly instead of through
torch's DistributedSampler."""

from .autodetect import detect as detect_dataset
from .loader import DataLoader, dataloader
from .mel2samp import Mel2Samp, load_mel_file
from .sc09 import SpeechCommands
from .stft import (TacotronSTFT, griffin_lim, istft, mel_filterbank,
                   stft_complex, stft_magnitude)
from .wav import MAX_WAV_VALUE, load_wav_float, load_wav_raw, save_wav

__all__ = [
    "DataLoader", "dataloader", "detect_dataset", "Mel2Samp",
    "load_mel_file",
    "SpeechCommands", "TacotronSTFT", "griffin_lim", "istft",
    "mel_filterbank", "stft_complex", "stft_magnitude",
    "MAX_WAV_VALUE", "load_wav_float", "load_wav_raw", "save_wav",
]
