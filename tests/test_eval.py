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
