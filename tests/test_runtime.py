"""End-to-end runtime tests: train loop, checkpoint/resume, generate CLI."""

import os
import pickle

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.config import load_config
from diffwave_sashimi_tpu.runtime.checkpoint import (
    load_checkpoint, save_checkpoint, smooth_checkpoints)
from diffwave_sashimi_tpu.runtime.train import train
from diffwave_sashimi_tpu.runtime.generate import generate


SMALL = ["experiment=sc09_wavenet", "model.res_channels=16",
         "model.skip_channels=16", "model.num_res_layers=2",
         "model.dilation_cycle=2", "dataset.segment_length=512",
         "diffusion.T=5", "train.n_iters=4", "train.iters_per_ckpt=2",
         "train.iters_per_logging=1", "train.batch_size_per_gpu=1",
         "generate.n_samples=1", "mesh.data=1", "compute.precision=f32"]


@pytest.fixture
def sc09_tiny(tmp_path):
    d = tmp_path / "sc09" / "zero"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        wavfile.write(str(d / f"s{i}_nohash_0.wav"), 16000,
                      (rng.randn(512) * 3000).astype(np.int16))
    return str(tmp_path / "sc09")


def test_checkpoint_roundtrip(tmp_path):
    params = {"params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}}
    d = str(tmp_path)
    save_checkpoint(d, 100, params)
    save_checkpoint(d, 300, jax.tree.map(lambda x: x * 3, params))
    ck = load_checkpoint(d, "max")
    assert ck["step"] == 300
    np.testing.assert_allclose(ck["model_state_dict"]["params"]["a"],
                               np.arange(4.0) * 3)
    assert load_checkpoint(d, -1) is None
    assert load_checkpoint(d, 99999) is None

    sm = smooth_checkpoints(d, 0, 300)
    np.testing.assert_allclose(sm["model_state_dict"]["params"]["a"],
                               np.arange(4.0) * 2)  # mean of 1x and 3x


def test_train_resume_and_generate(sc09_tiny, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=SMALL + [f"dataset.data_path={sc09_tiny}"])

    result = train(cfg.diffusion, cfg.model, cfg.dataset, None,
                   mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
                   **{k: v for k, v in dict(cfg.train).items()
                      if k != "name"})
    assert result["step"] == 4
    ckpt_dir = result["checkpoint_dir"]
    saved = sorted(os.listdir(ckpt_dir))
    assert "2.pkl" in saved and "4.pkl" in saved

    # resume picks up from max checkpoint
    result2 = train(cfg.diffusion, cfg.model, cfg.dataset, None,
                    mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
                    **{**{k: v for k, v in dict(cfg.train).items()
                          if k != "name"}, "n_iters": 6})
    assert result2["step"] == 6

    # generate from the saved checkpoint; wav lands in the exp layout
    out = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                   n_samples=2, batch_size=1)
    assert out.shape == (2, 1, 512)
    run = "wnet_h16_d2_T5_betaT0.02_uncond"
    wavs = os.listdir(os.path.join("exp", run, "waveforms", "6"))
    assert sorted(wavs) == ["0k_0.wav", "0k_1.wav"]


def test_generate_from_reference_torch_checkpoint(tmp_path, monkeypatch,
                                                  torch_ref):
    """A reference-framework torch checkpoint is loadable and sampleable."""
    torch = torch_ref.torch
    monkeypatch.chdir(tmp_path)
    from models.wavenet import WaveNet as RefWaveNet
    torch.manual_seed(0)
    net = RefWaveNet(res_channels=16, skip_channels=16, num_res_layers=2,
                     dilation_cycle=2, unconditional=True)
    run = "wnet_h16_d2_T5_betaT0.02_uncond"
    ckdir = os.path.join("exp", run, "checkpoint")
    os.makedirs(ckdir)
    torch.save({"model_state_dict": net.state_dict()},
               os.path.join(ckdir, "1000.pkl"))

    cfg = load_config(overrides=SMALL)
    out = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                   n_samples=1)
    assert out.shape == (1, 1, 512)
    assert np.isfinite(out).all()


def test_sampling_pipelined_deterministic_and_finite():
    from diffwave_sashimi_tpu.diffusion import (diffusion_schedule,
                                                sampling_pipelined)
    from diffwave_sashimi_tpu.models.wavenet import WaveNet

    model = WaveNet(res_channels=8, skip_channels=8, num_res_layers=2,
                    dilation_cycle=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 256)),
                        jnp.zeros((1,), jnp.int32))
    sched = diffusion_schedule(T=5, beta_0=1e-4, beta_T=0.02)

    def apply_fn(p, x, t, mel=None):
        return model.apply(p, x, t, mel)

    out1 = sampling_pipelined(apply_fn, params, (2, 1, 256), sched,
                              jax.random.PRNGKey(3))
    out2 = sampling_pipelined(apply_fn, params, (2, 1, 256), sched,
                              jax.random.PRNGKey(3))
    out3 = sampling_pipelined(apply_fn, params, (2, 1, 256), sched,
                              jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))
    assert np.isfinite(np.asarray(out1)).all()


def test_generate_rank_offsets_filenames(sc09_tiny, tmp_path, monkeypatch):
    """Multi-host generation parity: rank r writes files offset by
    n_samples*rank with rank-decorrelated noise (ref generate.py:84-86,189)."""
    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=SMALL + [f"dataset.data_path={sc09_tiny}"])
    train(cfg.diffusion, cfg.model, cfg.dataset, None,
          mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
          **{k: v for k, v in dict(cfg.train).items() if k != "name"})

    out0 = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                    n_samples=1, rank=0)
    out1 = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                    n_samples=1, rank=1)
    run = "wnet_h16_d2_T5_betaT0.02_uncond"
    wavs = sorted(os.listdir(os.path.join("exp", run, "waveforms", "4")))
    assert wavs == ["0k_0.wav", "0k_1.wav"]
    assert not np.array_equal(out0, out1)  # decorrelated across ranks


def test_generate_fast_beta_override(sc09_tiny, tmp_path, monkeypatch):
    """Fast inference: an explicit diffusion.beta list overrides T at
    generation time only (ref utils.py:133-135 fast=True semantics), while
    the run name keeps the training T."""
    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=SMALL + [f"dataset.data_path={sc09_tiny}"])
    train(cfg.diffusion, cfg.model, cfg.dataset, None,
          mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
          **{k: v for k, v in dict(cfg.train).items() if k != "name"})

    fast_cfg = load_config(overrides=SMALL + [
        f"dataset.data_path={sc09_tiny}",
        "diffusion.beta=[0.0001,0.001,0.01]"])
    out = generate(fast_cfg.diffusion, fast_cfg.model, fast_cfg.dataset,
                   ckpt_iter="max", n_samples=1)
    assert out.shape == (1, 1, 512)
    assert np.isfinite(out).all()


def test_generate_with_checkpoint_smoothing(sc09_tiny, tmp_path, monkeypatch):
    """ckpt_smooth averages checkpoints in (min, max] before sampling
    (reference's experimental smooth_ckpt, generate.py:105-115)."""
    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=SMALL + [f"dataset.data_path={sc09_tiny}"])
    train(cfg.diffusion, cfg.model, cfg.dataset, None,
          mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
          **{k: v for k, v in dict(cfg.train).items() if k != "name"})
    out = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                   n_samples=1, ckpt_smooth=0)
    assert out.shape == (1, 1, 512)
    assert np.isfinite(out).all()


def test_train_empty_dataset_errors(tmp_path, monkeypatch):
    """An empty/mismatched data dir must fail fast, not spin on 0 batches
    (the SC09 walker keeps only '*_nohash_*.wav' files)."""
    monkeypatch.chdir(tmp_path)
    empty = tmp_path / "nodata"
    empty.mkdir()
    cfg = load_config(overrides=SMALL + [f"dataset.data_path={empty}"])
    with pytest.raises(ValueError, match="0 batches"):
        train(cfg.diffusion, cfg.model, cfg.dataset, None,
              mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
              **{k: v for k, v in dict(cfg.train).items() if k != "name"})
