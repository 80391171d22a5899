"""End-to-end LJSpeech-HARDER operating point (reference
configs/experiment/ljspeech_harder.yaml: 2s segments L=44000, hop 2048,
mel_upsample [32, 64]): conditional training + mel-conditioned generation
at the long-segment/large-hop extreme, exercising S4 kernel length 44000
(FFT size 131072) and the 2048x mel upsampler."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-device / end-to-end heavy (fast lane skips)
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


def test_fused_v2_path_selected_at_44000():
    """The adaptive-R layout family (ops/fftconv2.default_R: R=512 at
    n=2^17 so S caps at 256) makes the layout-native fused conv feasible
    at the LJSpeech-harder operating point — the runtime must select it
    rather than the 0.19x-realtime XLA fallback."""
    import jax.numpy as jnp
    from diffwave_sashimi_tpu.models.sashimi import Sashimi
    from diffwave_sashimi_tpu.runtime.generate import select_kernel_mode
    from diffwave_sashimi_tpu.ops import fftconv2

    model = Sashimi(d_model=32, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=44000, unconditional=False, mel_upsample=(32, 64),
                    dtype=jnp.bfloat16)
    assert model.v2_compatible(44000)
    assert select_kernel_mode(model, 44000, on_tpu=True) == "v2"
    # one layout family across tiers: same R and Rc, S scales with pool
    R = fftconv2.default_R(1 << (2 * 44000 - 1).bit_length())
    assert R == 512
    lays = [fftconv2.choose_layout(Lt, 1 << (2 * Lt - 1).bit_length(),
                                   Ht, R=R, bf16=True)
            for Ht, Lt in ((32, 44000), (64, 11000), (128, 2750))]
    assert [l.S for l in lays] == [256, 64, 16]
    assert len({l.Rc for l in lays}) == 1
    assert all(fftconv2.layout_feasible(l) for l in lays)


def test_compact_forward_matches_flat_at_44000():
    """v2 kernels at the harder point compute the same forward as the
    flat path (which is reference-parity-tested)."""
    import jax
    import jax.numpy as jnp
    from diffwave_sashimi_tpu.models.sashimi import Sashimi

    L = 44000
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                    L=L, unconditional=False, mel_upsample=(32, 64))
    frames = L // 2048 + 1
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, 80, frames).astype(np.float32))
    audio = jnp.asarray(rng.randn(1, 1, L).astype(np.float32) * 0.3)
    steps = jnp.asarray([7], np.int32)
    params = model.init(jax.random.PRNGKey(0), audio, steps, mel)
    leaves, td = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = td.unflatten([l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                           for l, k in zip(leaves, ks)])
    y_flat = model.apply(params, audio, steps, mel)
    kernels = model.apply(params, L, "v2", method=Sashimi.compute_kernels)
    y_v2 = model.apply(params, audio, steps, mel, kernels=kernels)
    np.testing.assert_allclose(np.asarray(y_v2), np.asarray(y_flat),
                               atol=3e-4, rtol=1e-3)


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
