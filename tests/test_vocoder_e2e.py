"""End-to-end LJSpeech vocoding: conditional training + mel-conditioned generation."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-device / end-to-end heavy (fast lane skips)
from scipy.io import wavfile

import jax

from diffwave_sashimi_tpu.config import load_config
from diffwave_sashimi_tpu.runtime.train import train
from diffwave_sashimi_tpu.runtime.generate import generate


TINY = ["experiment=ljspeech", "model.d_model=8", "model.n_layers=1",
        "model.mel_upsample=[4,4]", "dataset.segment_length=1024",
        "dataset.hop_length=16", "dataset.filter_length=64",
        "dataset.win_length=64", "dataset.sampling_rate=22050",
        "diffusion.T=4", "train.n_iters=2", "train.iters_per_ckpt=2",
        "train.iters_per_logging=1", "train.batch_size_per_gpu=1",
        "generate.n_samples=1", "generate.mel_name=LJ000",
        "mesh.data=1", "compute.precision=f32"]


@pytest.fixture
def lj_tiny(tmp_path):
    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        wavfile.write(str(d / f"LJ00{i}.wav"), 22050,
                      (rng.randn(2048) * 3000).astype(np.int16))
    return str(d)


def test_vocoder_train_and_generate(lj_tiny, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=TINY + [f"dataset.data_path={lj_tiny}"])

    # conditional training with in-training conditional generation
    result = train(cfg.diffusion, cfg.model, cfg.dataset, cfg.generate,
                   mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
                   **{k: v for k, v in dict(cfg.train).items()
                      if k != "name"})
    assert result["step"] == 2
    run = ("unet_d8_n1_pool_2_expand2_ff2_T4_betaT0.05"
           "_L1024_hop16_cond")
    assert os.path.isdir(os.path.join("exp", run, "checkpoint"))

    # on-the-fly mel conditioning from {data_path}/{mel_name}.wav
    out = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                   n_samples=1, mel_name="LJ000")
    # audio_length = mel_frames * hop; 2048 samples -> 129 frames * 16 = 2064
    assert out.shape[0] == 1 and out.shape[1] == 1
    assert out.shape[2] == (2048 // 16 + 1) * 16
    assert np.isfinite(out).all()

    # the conditioning must actually move the output: same checkpoint,
    # same sampling seed (=> identical noise draws), different mel
    # (all tiny wavs are 2048 samples so audio_length matches)
    out_other = generate(cfg.diffusion, cfg.model, cfg.dataset,
                         ckpt_iter="max", n_samples=1, mel_name="LJ001")
    assert out_other.shape == out.shape
    assert np.abs(out - out_other).max() > 1e-7, \
        "generated audio is insensitive to the mel conditioning"

    # precomputed-spectrogram conditioning (mel_path)
    from diffwave_sashimi_tpu.data.mel2samp import main as mel_main
    mel_main(TINY + [f"dataset.data_path={lj_tiny}", "+output_dir=mels"])
    out2 = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                    n_samples=1, mel_name="LJ001", mel_path="mels")
    assert np.isfinite(out2).all()
