"""Data layer: STFT/mel numerics, SC09 semantics, loader behavior."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from diffwave_sashimi_tpu.data import (DataLoader, Mel2Samp, SpeechCommands,
                                       TacotronSTFT, dataloader,
                                       mel_filterbank, stft_magnitude)


# ---------- STFT ----------

def test_stft_matches_reference_conv_formulation(torch_ref):
    """Oracle: the reference conv1d-STFT (stft.py:100-163) with its librosa
    helpers shimmed (pad_center is the only one its transform path needs)."""
    torch = torch_ref.torch
    import torch.nn.functional as F
    from scipy.signal import get_window

    filter_length, hop, win = 256, 64, 256
    rng = np.random.RandomState(0)
    audio = rng.uniform(-0.5, 0.5, (2, 2048)).astype(np.float32)

    # reference basis construction (stft.py:110-131)
    fourier_basis = np.fft.fft(np.eye(filter_length))
    cutoff = filter_length // 2 + 1
    basis = np.vstack([np.real(fourier_basis[:cutoff]),
                       np.imag(fourier_basis[:cutoff])])
    fft_window = get_window("hann", win, fftbins=True)
    forward_basis = (basis[:, None, :] * fft_window).astype(np.float32)

    x = torch.from_numpy(audio).unsqueeze(1)
    x = F.pad(x.unsqueeze(1), (filter_length // 2, filter_length // 2, 0, 0),
              mode="reflect").squeeze(1)
    ft = F.conv1d(x, torch.from_numpy(forward_basis), stride=hop)
    real, imag = ft[:, :cutoff], ft[:, cutoff:]
    mag_ref = torch.sqrt(real ** 2 + imag ** 2).numpy()

    mag = stft_magnitude(audio, filter_length, hop, win)
    assert mag.shape == mag_ref.shape
    np.testing.assert_allclose(mag, mag_ref, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # filters cover only bins below fmax
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs > 8000.5].sum() == 0
    # each filter is unimodal with a single triangular peak
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney normalization: integral over Hz of each filter ~= 1
    # (sum * bin_width ~ triangle area ~ 1 after 2/(width) normalization)
    widths = np.array([
        (fb[i] > 0).sum() for i in range(80)])
    assert (widths > 0).all()
    areas = fb.sum(axis=1) * (freqs[1] - freqs[0])
    np.testing.assert_allclose(areas[5:], 1.0, rtol=0.15)


def test_mel_spectrogram_frame_count_and_sine_peak():
    sr, L, hop = 22050, 16000, 256
    stft = TacotronSTFT(1024, hop, 1024, 80, sr, 0.0, 8000.0)
    t = np.arange(L) / sr
    audio = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    mel = stft.mel_spectrogram(audio[None, :])
    # conv framing: floor(L/hop) + 1 frames
    assert mel.shape == (1, 80, L // hop + 1)
    # peak mel bin should correspond to ~1 kHz (Slaney mel ~ bin 36 of 80
    # for fmax=8000); just assert it's an interior bin with sane ordering
    peak = mel[0, :, 10].argmax()
    assert 20 < peak < 50
    assert np.isfinite(mel).all()
    assert mel.min() >= np.log(1e-5) - 1e-6


# ---------- datasets ----------

@pytest.fixture
def sc09_dir(tmp_path):
    rng = np.random.RandomState(0)
    for label in ("zero", "one"):
        d = tmp_path / label
        d.mkdir()
        for i in range(3):
            L = [12000, 16000, 20000][i]
            data = (rng.randn(L) * 3000).astype(np.int16)
            wavfile.write(str(d / f"spk{i}_nohash_{i}.wav"), 16000, data)
        # a file without _nohash_ must be excluded
        wavfile.write(str(d / "ignored.wav"), 16000,
                      np.zeros(100, np.int16))
    bg = tmp_path / "_background_noise_"
    bg.mkdir()
    wavfile.write(str(bg / "noise_nohash_0.wav"), 16000,
                  np.zeros(100, np.int16))
    return str(tmp_path)


def test_sc09_dataset(sc09_dir):
    ds = SpeechCommands(sc09_dir)
    assert len(ds) == 6  # 2 labels x 3 files; excludes no-hash + background
    for i in range(len(ds)):
        wav, sr, label = ds[i]
        assert wav.shape == (1, 16000)
        assert sr == 16000
        assert label in ("zero", "one")
        assert np.abs(wav).max() <= 1.0


@pytest.fixture
def lj_dir(tmp_path):
    rng = np.random.RandomState(1)
    for i in range(3):
        L = [4000, 9000, 2000][i]
        data = (rng.randn(L) * 3000).astype(np.int16)
        wavfile.write(str(tmp_path / f"LJ00{i}.wav"), 22050, data)
    return str(tmp_path)


def test_mel2samp_dataset(lj_dir):
    ds = Mel2Samp(data_path=lj_dir, valid=False, segment_length=4096,
                  filter_length=1024, hop_length=256, win_length=1024,
                  sampling_rate=22050, mel_fmin=0.0, mel_fmax=8000.0)
    mel, audio = ds[0]
    assert audio.shape == (1, 4096)
    assert mel.shape == (80, 4096 // 256 + 1)
    assert np.abs(audio).max() <= 1.0

    # valid mode returns whole utterances
    ds_valid = Mel2Samp(data_path=lj_dir, valid=True, segment_length=4096,
                        filter_length=1024, hop_length=256, win_length=1024,
                        sampling_rate=22050, mel_fmin=0.0, mel_fmax=8000.0)
    lengths = {ds_valid[i][1].shape[1] for i in range(3)}
    assert lengths == {4000, 9000, 2000}


def test_mel2samp_wrong_sr_raises(lj_dir):
    ds = Mel2Samp(data_path=lj_dir, valid=False, segment_length=1024,
                  filter_length=1024, hop_length=256, win_length=1024,
                  sampling_rate=16000, mel_fmin=0.0, mel_fmax=8000.0)
    with pytest.raises(ValueError, match="SR"):
        ds[0]


# ---------- loader ----------

def test_dataloader_batching_and_sharding(sc09_dir):
    cfg = {"_name_": "sc09", "data_path": sc09_dir,
           "segment_length": 16000, "sampling_rate": 16000}
    dl = dataloader(cfg, batch_size=2, num_replicas=1, unconditional=True)
    batches = list(dl)
    assert len(batches) == 3  # 6 items / bs 2
    wavs, srs, labels = batches[0]
    assert wavs.shape == (2, 1, 16000)

    # two replicas see disjoint shards covering everything
    dl0 = dataloader(cfg, batch_size=1, num_replicas=2, replica_id=0,
                     unconditional=True)
    dl1 = dataloader(cfg, batch_size=1, num_replicas=2, replica_id=1,
                     unconditional=True)
    assert len(dl0) == 3 and len(dl1) == 3

    # different epochs reshuffle
    d2 = dataloader(cfg, batch_size=6, unconditional=True)
    e1 = next(iter(d2))[0]
    e2 = next(iter(d2))[0]
    assert not np.array_equal(e1, e2)


def test_dataloader_abandoned_iterator_stops_producer(sc09_dir):
    """Abandoning iteration mid-epoch (train loop hitting n_iters) must not
    leak the prefetch producer thread blocked on a full queue — six such
    threads were alive in the 2026-08-18 suite crash dump."""
    import threading
    import time

    cfg = {"_name_": "sc09", "data_path": sc09_dir,
           "segment_length": 16000, "sampling_rate": 16000}
    before = threading.active_count()
    for _ in range(4):
        it = iter(dataloader(cfg, batch_size=1, unconditional=True))
        next(it)          # one batch, then abandon mid-epoch
        it.close()        # what GC does to a live generator
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_istft_roundtrip():
    from diffwave_sashimi_tpu.data.stft import (istft, stft_complex,
                                                stft_magnitude)
    rng = np.random.RandomState(0)
    audio = rng.uniform(-0.5, 0.5, (1, 4096)).astype(np.float32)
    n_fft, hop, win = 256, 64, 256
    spec = stft_complex(audio, n_fft, hop, win)
    mag, phase = np.abs(spec), np.angle(spec)
    assert np.allclose(mag, stft_magnitude(audio, n_fft, hop, win), atol=1e-5)
    rec = istft(mag, phase, n_fft, hop, win)
    # interior samples reconstruct (edges lose the reflect-pad context)
    assert rec.shape[-1] >= 4000
    n = min(rec.shape[-1], 4096)
    np.testing.assert_allclose(rec[0, 200:n - 200], audio[0, 200:n - 200],
                               atol=1e-4)


def test_griffin_lim_reduces_spectral_error():
    from diffwave_sashimi_tpu.data.stft import griffin_lim, stft_magnitude
    sr = 8000
    t = np.arange(4096) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    n_fft, hop, win = 256, 64, 256
    mag = stft_magnitude(audio, n_fft, hop, win)
    rec = griffin_lim(mag, n_fft, hop, win, n_iters=20)
    mag_rec = stft_magnitude(np.clip(rec, -1, 1), n_fft, hop, win)
    m = min(mag.shape[-1], mag_rec.shape[-1])
    rel = np.linalg.norm(mag_rec[..., :m] - mag[..., :m]) / np.linalg.norm(mag)
    assert rel < 0.35  # phase-blind reconstruction gets close in magnitude


def test_audio_metrics():
    from diffwave_sashimi_tpu.utils.audio_metrics import (compare,
                                                          compare_files)
    rng = np.random.RandomState(0)
    sr, L = 16000, 8000
    a = (0.4 * np.sin(2 * np.pi * 440 * np.arange(L) / sr)).astype(np.float32)
    m_same = compare(a, a.copy(), sr)
    assert m_same["waveform_mse"] == 0.0
    assert m_same["snr_db"] == float("inf")
    assert m_same["log_mel_l2"] < 1e-6

    noisy = a + 0.01 * rng.randn(L).astype(np.float32)
    m_noisy = compare(a, noisy, sr)
    assert 20 < m_noisy["snr_db"] < 40
    assert m_noisy["log_mel_l2"] > m_same["log_mel_l2"]
    assert m_noisy["spectral_convergence"] > 0

    very_noisy = a + 0.2 * rng.randn(L).astype(np.float32)
    m_vn = compare(a, very_noisy, sr)
    assert m_vn["snr_db"] < m_noisy["snr_db"]
    assert m_vn["log_mel_l2"] > m_noisy["log_mel_l2"]


def test_dataset_autodetect(tmp_path, monkeypatch):
    """data.detect_dataset finds real corpora by location + filename
    signature (min-file threshold rules out placeholder dirs) and is
    driven by DWST_DATA_ROOT first; absent datasets return None."""
    from diffwave_sashimi_tpu.data import detect_dataset

    monkeypatch.setenv("DWST_DATA_ROOT", str(tmp_path))
    assert detect_dataset("sc09") is None
    assert detect_dataset("ljspeech") is None

    sc = tmp_path / "sc09"
    sc.mkdir()
    for i in range(8):
        (sc / f"zero_nohash_{i}.wav").write_bytes(b"RIFF")
    assert detect_dataset("sc09") == str(sc)
    # signature mismatch (no _nohash_) does not count
    lj = tmp_path / "LJSpeech-1.1" / "wavs"
    lj.mkdir(parents=True)
    for i in range(7):
        (lj / f"LJ001-{i:04d}.wav").write_bytes(b"RIFF")
    assert detect_dataset("ljspeech") is None  # below min_files=8
    (lj / "LJ001-0007.wav").write_bytes(b"RIFF")
    assert detect_dataset("ljspeech") == str(lj)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        detect_dataset("nope")
