"""WaveNet backbone parity: our flax model vs the reference torch model.

The reference model (models/wavenet.py) runs on CPU with random init; weights
are exported via ``state_dict()`` and imported through
``utils.torch_compat.wavenet_from_torch``.  Forward outputs must agree to f32
tolerance on identical inputs.
"""

import numpy as np
import pytest

from diffwave_sashimi_tpu.models.wavenet import WaveNet
from diffwave_sashimi_tpu.utils.torch_compat import wavenet_from_torch


@pytest.fixture(scope="module")
def small_cfg():
    return dict(res_channels=24, skip_channels=16, num_res_layers=4,
                dilation_cycle=2)


def _make_ref(torch_ref, small_cfg, unconditional=True, mel_upsample=(16, 16)):
    torch = torch_ref.torch
    from models.wavenet import WaveNet as RefWaveNet
    torch.manual_seed(1234)
    net = RefWaveNet(in_channels=1, out_channels=1,
                     unconditional=unconditional,
                     mel_upsample=list(mel_upsample), **small_cfg)
    net.eval()
    return net


def test_unconditional_forward_parity(torch_ref, small_cfg):
    torch = torch_ref.torch
    net = _make_ref(torch_ref, small_cfg)

    B, L = 3, 512
    rng = np.random.RandomState(0)
    audio = rng.randn(B, 1, L).astype(np.float32)
    steps = np.array([0, 57, 199])

    with torch.no_grad():
        ref_out = net((torch.from_numpy(audio),
                       torch.from_numpy(steps.astype(np.float32)).view(B, 1)))
    ref_out = ref_out.numpy()

    model = WaveNet(unconditional=True, **small_cfg)
    params = {"params": wavenet_from_torch(net.state_dict(),
                                           small_cfg["num_res_layers"])}
    ours = np.asarray(model.apply(params, audio, steps))

    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def test_conditional_forward_parity(torch_ref, small_cfg):
    torch = torch_ref.torch
    net = _make_ref(torch_ref, small_cfg, unconditional=False,
                    mel_upsample=(4, 4))

    B, L, M, frames = 2, 256, 80, 16  # hop 16 = 4*4
    rng = np.random.RandomState(1)
    audio = rng.randn(B, 1, L).astype(np.float32)
    mel = rng.randn(B, M, frames).astype(np.float32)
    steps = np.array([3, 40])

    with torch.no_grad():
        ref_out = net((torch.from_numpy(audio),
                       torch.from_numpy(steps.astype(np.float32)).view(B, 1)),
                      mel_spec=torch.from_numpy(mel))
    ref_out = ref_out.numpy()

    model = WaveNet(unconditional=False, mel_upsample=(4, 4), **small_cfg)
    params = {"params": wavenet_from_torch(
        net.state_dict(), small_cfg["num_res_layers"], conditional=True)}
    ours = np.asarray(model.apply(params, audio, steps, mel))

    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def test_init_statistics_match_torch_defaults(small_cfg):
    """Effective init (weight-norm v, g=||v||) matches torch conv defaults."""
    import jax
    import jax.numpy as jnp

    model = WaveNet(unconditional=True, **small_cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64)),
                        jnp.zeros((1,), jnp.int32))["params"]
    blk = params["block0"]["dilated_conv"]
    v, g = np.asarray(blk["v"]), np.asarray(blk["g"])
    fan_in = v.shape[1] * v.shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(v).max() <= bound + 1e-6
    # g equals the per-output-channel norm of v at init
    np.testing.assert_allclose(g, np.sqrt((v ** 2).sum(axis=(1, 2))),
                               rtol=1e-6)
    # zero-init output conv
    assert np.all(np.asarray(params["final_conv2"]["w"]) == 0)
