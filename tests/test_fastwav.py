"""Native fastwav decoder vs the scipy oracle, and its pipeline wiring."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from diffwave_sashimi_tpu.data import fastwav
from diffwave_sashimi_tpu.data.loader import dataloader

pytestmark = pytest.mark.skipif(not fastwav.available(),
                                reason="libfastwav.so not built")


@pytest.fixture
def wavs(tmp_path):
    rng = np.random.RandomState(0)
    paths, refs = [], []
    for i, L in enumerate([100, 16000, 30000]):
        p = str(tmp_path / f"w{i}.wav")
        data = (rng.randn(L) * 3000).astype(np.int16)
        wavfile.write(p, 16000, data)
        paths.append(p)
        refs.append(data)
    return paths, refs


def test_decode_matches_scipy(wavs):
    paths, refs = wavs
    out, srs, lens, status = fastwav.decode_batch(paths, 16000,
                                                  scale=1 / 32768.0)
    assert (status == 0).all()
    assert (srs == 16000).all()
    assert list(lens) == [100, 16000, 30000]
    for i, ref in enumerate(refs):
        L = min(len(ref), 16000)
        np.testing.assert_allclose(out[i, :L], ref[:L] / 32768.0)
        assert (out[i, L:] == 0).all()


def test_probe(wavs):
    paths, refs = wavs
    assert fastwav.probe(paths[2]) == (16000, 30000)


def test_crop_window_is_real_data(wavs):
    paths, refs = wavs
    out, _, _, status = fastwav.decode_batch([paths[2]], 4000, crop=True,
                                             crop_seed=5)
    assert status[0] == 0
    # the cropped window appears contiguously in the source
    src = refs[2].astype(np.float32)
    starts = np.where(src == out[0, 0])[0]
    assert any(np.array_equal(src[s:s + 4000], out[0]) for s in starts
               if s + 4000 <= len(src))


def test_bad_file_reports_failure(tmp_path, wavs):
    paths, _ = wavs
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav file at all")
    out, srs, lens, status = fastwav.decode_batch([paths[0], bad], 1000)
    assert status[0] == 0 and status[1] != 0


def test_loader_uses_native_batch(tmp_path):
    d = tmp_path / "zero"
    d.mkdir()
    rng = np.random.RandomState(1)
    for i in range(4):
        wavfile.write(str(d / f"s{i}_nohash_0.wav"), 16000,
                      (rng.randn(8000) * 3000).astype(np.int16))
    cfg = {"_name_": "sc09", "data_path": str(tmp_path),
           "segment_length": 16000, "sampling_rate": 16000}
    dl = dataloader(cfg, batch_size=2, unconditional=True)
    wavs_b, srs, labels = next(iter(dl))
    assert wavs_b.shape == (2, 1, 16000)
    assert np.abs(wavs_b).max() <= 1.0
    assert labels == ["zero", "zero"]
