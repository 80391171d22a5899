"""FID/IS harness: metric math against closed forms, classifier training,
and the end-to-end scoring CLI on synthetic data."""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from diffwave_sashimi_tpu.eval.fid import (frechet_distance, gaussian_stats,
                                           inception_score)


def test_frechet_distance_closed_form():
    # identical Gaussians -> 0
    rng = np.random.RandomState(0)
    x = rng.randn(4000, 8)
    mu, sig = gaussian_stats(x)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-4
    # mean shift d with identity covariances -> |d|^2
    d = np.zeros(8)
    d[0] = 3.0
    eye = np.eye(8)
    v = frechet_distance(np.zeros(8), eye, d, eye)
    np.testing.assert_allclose(v, 9.0, rtol=1e-4)
    # scalar case: (m1-m2)^2 + (s1+s2-2 sqrt(s1 s2))
    v = frechet_distance(np.zeros(1), 4 * np.eye(1), np.ones(1), np.eye(1))
    np.testing.assert_allclose(v, 1 + 4 + 1 - 2 * 2.0, rtol=1e-5)


def test_inception_score_bounds():
    n, c = 500, 10
    # uniform predictions -> IS = 1
    u = np.full((n, c), 1.0 / c)
    m, s = inception_score(u)
    np.testing.assert_allclose(m, 1.0, rtol=1e-6)
    # confident + diverse predictions -> IS = C
    p = np.eye(c)[np.arange(n) % c] * 0.999 + 0.001 / c
    m, _ = inception_score(p, splits=1)
    assert m > 0.9 * c
    # confident but collapsed to one class -> IS ~ 1
    p1 = np.zeros((n, c)) + 1e-9
    p1[:, 3] = 1.0
    m, _ = inception_score(p1, splits=1)
    assert m < 1.1


@pytest.fixture(scope="module")
def sc09_tree(tmp_path_factory):
    """Synthetic 'digits': per class, tones at distinct frequencies."""
    root = tmp_path_factory.mktemp("sc09")
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    for ci, label in enumerate(("zero", "one", "two")):
        d = root / label
        d.mkdir()
        f0 = 300 + 200 * ci
        for i in range(12):
            a = 0.3 * np.sin(2 * np.pi * (f0 + rng.randn() * 10) * t)
            a = (a + 0.01 * rng.randn(16000)) * 32000
            wavfile.write(str(d / f"s{i}_nohash_0.wav"), 16000,
                          a.astype(np.int16))
    return str(root)


def test_score_real_sampler_output(sc09_tree, tmp_path, monkeypatch):
    """The quality loop end-to-end: train (tiny) -> generate with the REAL
    sampler (wavs land in the exp/<run>/waveforms layout) -> score that
    directory with the FID/IS harness.  Pins that the scoring path accepts
    actual sampler output, not just hand-built files."""
    from diffwave_sashimi_tpu.config import load_config
    from diffwave_sashimi_tpu.eval.sc09_eval import main
    from diffwave_sashimi_tpu.runtime.generate import generate
    from diffwave_sashimi_tpu.runtime.train import train

    monkeypatch.chdir(tmp_path)
    cfg = load_config(overrides=[
        "experiment=sc09_wavenet", "model.res_channels=16",
        "model.skip_channels=16", "model.num_res_layers=2",
        "model.dilation_cycle=2", "dataset.segment_length=512",
        "diffusion.T=4", "train.n_iters=2", "train.iters_per_ckpt=2",
        "train.iters_per_logging=1", "train.batch_size_per_gpu=1",
        "generate.n_samples=4", "mesh.data=1", "compute.precision=f32",
        f"dataset.data_path={sc09_tree}"])
    train(cfg.diffusion, cfg.model, cfg.dataset, None,
          mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
          **{k: v for k, v in dict(cfg.train).items() if k != "name"})
    generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
             n_samples=4, batch_size=2)
    wav_dir = os.path.join("exp", "wnet_h16_d2_T4_betaT0.02_uncond",
                           "waveforms", "2")
    assert len(os.listdir(wav_dir)) == 4

    clf_path = str(tmp_path / "clf.pkl")
    main(["train", "--data", sc09_tree, "--classifier", clf_path,
          "--epochs", "4", "--batch", "8"])
    s = main(["score", "--real", sc09_tree, "--generated", wav_dir,
              "--classifier", clf_path, "--n", "36"])
    assert np.isfinite(s["fid"]) and np.isfinite(s["is"])
    assert s["n_generated"] == 4 if "n_generated" in s else True


def test_train_and_score_cli(sc09_tree, tmp_path):
    from diffwave_sashimi_tpu.eval.sc09_eval import main

    clf_path = str(tmp_path / "clf.pkl")
    r = main(["train", "--data", sc09_tree, "--classifier", clf_path,
              "--epochs", "12", "--batch", "8"])
    assert os.path.exists(clf_path)
    assert r["final_acc"] >= 0.75   # tones are trivially separable

    # 'generated' = real tones (good) vs pure noise (bad)
    good = tmp_path / "good"
    bad = tmp_path / "bad"
    good.mkdir(), bad.mkdir()
    rng = np.random.RandomState(1)
    t = np.arange(16000) / 16000.0
    for i in range(12):
        f0 = 300 + 200 * (i % 3)
        wavfile.write(str(good / f"g{i}.wav"), 16000,
                      (0.3 * np.sin(2 * np.pi * f0 * t) * 32000)
                      .astype(np.int16))
        wavfile.write(str(bad / f"b{i}.wav"), 16000,
                      (rng.randn(16000) * 8000).astype(np.int16))

    s_good = main(["score", "--real", sc09_tree, "--generated", str(good),
                   "--classifier", clf_path, "--n", "36"])
    s_bad = main(["score", "--real", sc09_tree, "--generated", str(bad),
                  "--classifier", clf_path, "--n", "36"])
    assert np.isfinite(s_good["fid"]) and np.isfinite(s_bad["fid"])
    assert s_good["fid"] < s_bad["fid"]   # real-like scores better
    assert s_good["is"] >= 1.0
