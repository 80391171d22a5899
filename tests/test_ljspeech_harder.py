"""End-to-end LJSpeech-HARDER operating point (reference
configs/experiment/ljspeech_harder.yaml: 2s segments L=44000, hop 2048,
mel_upsample [32, 64]): conditional training + mel-conditioned generation
at the long-segment/large-hop extreme, exercising S4 kernel length 44000
(FFT size 131072) and the 2048x mel upsampler."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from diffwave_sashimi_tpu.config import load_config
from diffwave_sashimi_tpu.runtime.generate import generate
from diffwave_sashimi_tpu.runtime.train import train

TINY = ["experiment=ljspeech_harder", "model.d_model=8", "model.n_layers=1",
        "diffusion.T=2", "train.n_iters=1", "train.iters_per_ckpt=1",
        "train.iters_per_logging=1", "train.batch_size_per_gpu=1",
        "generate.n_samples=1", "generate.mel_name=LJ000",
        "generate.mel_path=null",
        "mesh.data=1", "compute.precision=f32"]


@pytest.fixture
def lj_long(tmp_path):
    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        wavfile.write(str(d / f"LJ00{i}.wav"), 22050,
                      (rng.randn(50000) * 3000).astype(np.int16))
    return str(d)


def test_harder_vocoder_train_and_generate(lj_long, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=TINY + [f"dataset.data_path={lj_long}"])
    assert int(cfg.dataset.segment_length) == 44000
    assert int(cfg.dataset.hop_length) == 2048
    assert list(cfg.model.mel_upsample) == [32, 64]

    result = train(cfg.diffusion, cfg.model, cfg.dataset, cfg.generate,
                   mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
                   **{k: v for k, v in dict(cfg.train).items()
                      if k != "name"})
    assert result["step"] == 1
    run = ("unet_d8_n1_pool_2_expand2_ff2_T2_betaT0.05"
           "_L44000_hop2048_cond")
    assert os.path.isdir(os.path.join("exp", run, "checkpoint"))

    out = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                   n_samples=1, mel_name="LJ000")
    # audio_length = mel_frames * hop = (50000 // 2048 + 1) * 2048
    assert out.shape == (1, 1, (50000 // 2048 + 1) * 2048)
    assert np.isfinite(out).all()
    # fidelity report emitted for conditional generation
    wf = os.path.join("exp", run, "waveforms")
    fids = [os.path.join(r, f) for r, _, fs in os.walk(wf) for f in fs
            if f == "fidelity.json"]
    assert fids, "fidelity.json not written"
