"""Config composition: Hydra-compatible defaults, overrides, interpolation."""

import pytest

from diffwave_sashimi_tpu.config import load_config
from diffwave_sashimi_tpu.utils import local_directory


def test_default_is_sc09_sashimi():
    cfg = load_config()
    assert cfg.model._name_ == "sashimi"
    assert cfg.dataset._name_ == "sc09"
    assert cfg.diffusion.T == 200
    assert cfg.diffusion.beta_T == 0.02
    assert cfg.train.learning_rate == 2e-4
    assert cfg.train.batch_size_per_gpu == 4
    # interpolation: model.L <- dataset.segment_length
    assert cfg.model.L == 16000


def test_experiment_selection_and_overrides():
    cfg = load_config(overrides=[
        "experiment=ljspeech", "model.d_model=32", "train.n_iters=5",
        "generate.mel_name=null", "+output_dir=mels",
    ])
    assert cfg.model.unconditional is False
    assert cfg.diffusion.T == 50
    assert cfg.diffusion.beta_T == 0.05
    assert cfg.dataset.hop_length == 256
    assert cfg.model.d_model == 32
    assert cfg.train.n_iters == 5
    assert cfg.generate.mel_name is None
    assert cfg.output_dir == "mels"
    assert cfg.model.mel_upsample == [16, 16]


def test_model_group_override():
    cfg = load_config(overrides=["experiment=sc09", "model=sashimi_small"])
    assert cfg.model.d_model == 64
    assert cfg.model.L == 16000


def test_harder_experiment_interpolation():
    cfg = load_config(overrides=["experiment=ljspeech_harder"])
    assert cfg.dataset.segment_length == 44000
    assert cfg.model.L == 44000  # interpolation sees the experiment overlay
    assert cfg.model.mel_upsample == [32, 64]


def test_run_names_match_reference_layout(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config()
    name, out = local_directory(None, cfg.model, cfg.diffusion, cfg.dataset,
                                "checkpoint")
    # exact on-disk names the reference produced (visible in /root/reference/exp)
    assert name == "unet_d128_n6_pool_2_expand2_ff2_T200_betaT0.02_uncond"
    assert out.endswith("exp/unet_d128_n6_pool_2_expand2_ff2_T200_betaT0.02_uncond/checkpoint")

    cfg = load_config(overrides=["experiment=ljspeech", "model.d_model=32"])
    name, _ = local_directory(None, cfg.model, cfg.diffusion, cfg.dataset,
                              "waveforms")
    assert name == "unet_d32_n6_pool_2_expand2_ff2_T50_betaT0.05_L16000_hop256_cond"

    cfg = load_config(overrides=["experiment=sc09_wavenet"])
    name, _ = local_directory(None, cfg.model, cfg.diffusion, cfg.dataset,
                              "checkpoint")
    assert name == "wnet_h256_d36_T200_betaT0.02_uncond"


def test_find_max_epoch(tmp_path):
    from diffwave_sashimi_tpu.utils import find_max_epoch
    d = tmp_path / "ck"
    assert find_max_epoch(str(d)) == -1
    d.mkdir()
    assert find_max_epoch(str(d)) == -1
    (d / "1000.pkl").touch()
    (d / "20000.pkl").touch()
    (d / "junk.pkl").touch()
    (d / "5.txt").touch()
    assert find_max_epoch(str(d)) == 20000


def test_multirun_sweep_expansion():
    """Hydra choice-sweep semantics: comma-listed values expand to the
    cartesian product; brackets/quotes protect commas; later overrides
    vary fastest (reference gets this free from @hydra.main, train.py:226)."""
    from diffwave_sashimi_tpu.config import (extract_multirun_flag,
                                             sweep_overrides)

    args, mr = extract_multirun_flag(
        ["-m", "model.d_model=32,64", "train.n_iters=1"])
    assert mr and args == ["model.d_model=32,64", "train.n_iters=1"]
    args2, mr2 = extract_multirun_flag(["model.d_model=32"])
    assert not mr2 and args2 == ["model.d_model=32"]

    jobs = sweep_overrides(["model.d_model=32,64", "diffusion.T=10,20"])
    assert jobs == [
        ["model.d_model=32", "diffusion.T=10"],
        ["model.d_model=32", "diffusion.T=20"],
        ["model.d_model=64", "diffusion.T=10"],
        ["model.d_model=64", "diffusion.T=20"],
    ]
    # brackets protect commas: two pool choices, not four scalars
    jobs = sweep_overrides(["model.pool=[2,2],[4,4]"])
    assert jobs == [["model.pool=[2,2]"], ["model.pool=[4,4]"]]
    # non-sweep args pass through untouched
    assert sweep_overrides(["experiment=sc09"]) == [["experiment=sc09"]]
