"""Gradient parity vs the reference torch implementation.

Forward parity says the functions agree; gradient parity says TRAINING
agrees — it exercises the weight-norm backward, the gated-conv backward,
and (for S4) the Cauchy/FFT convolution backward through identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.models.wavenet import WaveNet
from diffwave_sashimi_tpu.models.s4 import S4
from diffwave_sashimi_tpu.utils.torch_compat import (wavenet_from_torch,
                                                     _s4_from_torch)


def test_wavenet_grad_parity(torch_ref):
    torch = torch_ref.torch
    from models.wavenet import WaveNet as RefWaveNet
    torch.manual_seed(7)
    cfg = dict(res_channels=16, skip_channels=12, num_res_layers=3,
               dilation_cycle=2)
    net = RefWaveNet(in_channels=1, out_channels=1, unconditional=True, **cfg)
    net.train()

    B, L = 2, 256
    rng = np.random.RandomState(0)
    audio = rng.randn(B, 1, L).astype(np.float32)
    target = rng.randn(B, 1, L).astype(np.float32)
    steps = np.array([3.0, 77.0], np.float32)

    out = net((torch.from_numpy(audio), torch.from_numpy(steps).view(B, 1)))
    loss = ((out - torch.from_numpy(target)) ** 2).mean()
    loss.backward()
    ref_loss = float(loss)
    ref_grads = {k: v.grad.numpy() for k, v in net.named_parameters()
                 if v.grad is not None}

    model = WaveNet(unconditional=True, **cfg)
    params = {"params": wavenet_from_torch(net.state_dict(),
                                           cfg["num_res_layers"])}

    def loss_fn(p):
        y = model.apply(p, audio, steps.astype(np.int32))
        return jnp.mean((y - target) ** 2)

    our_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(our_loss), ref_loss, rtol=1e-5)

    g = grads["params"]
    pairs = [
        (g["init_conv"]["v"], ref_grads["init_conv.0.conv.weight_v"]),
        (g["init_conv"]["g"],
         ref_grads["init_conv.0.conv.weight_g"].reshape(-1)),
        (g["fc_t1"]["w"], ref_grads["residual_layer.fc_t1.weight"]),
        (g["block1"]["dilated_conv"]["v"],
         ref_grads["residual_layer.residual_blocks.1.dilated_conv_layer.conv.weight_v"]),
        (g["block2"]["skip_conv"]["b"],
         ref_grads["residual_layer.residual_blocks.2.skip_conv.bias"]),
        (g["final_conv2"]["w"],
         ref_grads["final_conv.2.conv.weight"][:, :, 0]),
    ]
    for ours, ref in pairs:
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5,
                                   rtol=1e-3)


def test_s4_grad_parity(torch_ref):
    torch = torch_ref.torch
    from models.s4 import S4 as RefS4
    torch.manual_seed(11)
    H, N, L = 6, 8, 128
    layer = RefS4(d_model=H, d_state=N, l_max=L, bidirectional=True)
    layer.train()
    with torch.no_grad():
        layer(torch.zeros(1, H, L))  # lazy C -> C~ setup

    rng = np.random.RandomState(1)
    u = rng.randn(2, H, L).astype(np.float32)
    target = rng.randn(2, H, L).astype(np.float32)

    y, _ = layer(torch.from_numpy(u))
    loss = ((y - torch.from_numpy(target)) ** 2).mean()
    loss.backward()
    ref_loss = float(loss)
    ref_grads = {k: v.grad.numpy() for k, v in layer.named_parameters()
                 if v.grad is not None}

    sd = {("x." + k): v for k, v in layer.state_dict().items()}
    params = {"params": _s4_from_torch(sd, "x")}
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=True)

    def loss_fn(p):
        y = mod.apply(p, jnp.asarray(u))
        return jnp.mean((y - target) ** 2)

    our_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(our_loss), ref_loss, rtol=1e-4)

    g = grads["params"]
    np.testing.assert_allclose(np.asarray(g["D"]), ref_grads["D"],
                               atol=1e-5, rtol=1e-3)
    # SSM tensor grads flow through Cauchy + Woodbury + irfft
    np.testing.assert_allclose(np.asarray(g["kernel"]["log_dt"]),
                               ref_grads["kernel.kernel.log_dt"],
                               atol=1e-4, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(g["kernel"]["C"]),
                               ref_grads["kernel.kernel.C"],
                               atol=1e-4, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(g["kernel"]["w_imag"]),
                               ref_grads["kernel.kernel.w_imag"],
                               atol=1e-4, rtol=5e-2)
