"""SaShiMi backbone parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.models.sashimi import Sashimi
from diffwave_sashimi_tpu.utils.torch_compat import sashimi_from_torch


def _make_ref(torch_ref, unconditional=True, mel_upsample=(4, 4), d_model=8,
              n_layers=1, L=256, seed=0):
    torch = torch_ref.torch
    from models.sashimi import Sashimi as RefSashimi
    torch.manual_seed(seed)
    net = RefSashimi(d_model=d_model, n_layers=n_layers, pool=[4, 4],
                     expand=2, ff=2, unet=True, L=L,
                     unconditional=unconditional,
                     mel_upsample=list(mel_upsample))
    net.eval()
    # trigger every S4's lazy C -> C~ setup
    with torch.no_grad():
        steps = torch.zeros(1, 1)
        if unconditional:
            net((torch.zeros(1, 1, L), steps))
        else:
            frames = L // int(np.prod(mel_upsample))
            net((torch.zeros(1, 1, L), steps),
                mel_spec=torch.zeros(1, 80, frames))
    return net


def test_sashimi_unconditional_parity(torch_ref):
    torch = torch_ref.torch
    d_model, n_layers, L = 8, 1, 256
    net = _make_ref(torch_ref, d_model=d_model, n_layers=n_layers, L=L)

    rng = np.random.RandomState(0)
    audio = rng.randn(2, 1, L).astype(np.float32)
    steps = np.array([7, 123])
    with torch.no_grad():
        y_ref = net((torch.from_numpy(audio),
                     torch.from_numpy(steps.astype(np.float32)).view(2, 1)))
    y_ref = y_ref.numpy()

    params = sashimi_from_torch(net.state_dict(), n_layers=n_layers,
                                pool=[4, 4])
    model = Sashimi(d_model=d_model, n_layers=n_layers, pool=(4, 4), L=L)  # block_scan default
    y_ours = np.asarray(model.apply({"params": params}, audio, steps))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-3, rtol=1e-2)


def test_sashimi_conditional_parity(torch_ref):
    torch = torch_ref.torch
    d_model, n_layers, L = 8, 1, 256
    mel_up = (4, 4)  # hop 16
    net = _make_ref(torch_ref, unconditional=False, mel_upsample=mel_up,
                    d_model=d_model, n_layers=n_layers, L=L)

    rng = np.random.RandomState(1)
    audio = rng.randn(2, 1, L).astype(np.float32)
    frames = L // 16
    mel = rng.randn(2, 80, frames).astype(np.float32)
    steps = np.array([3, 40])
    with torch.no_grad():
        y_ref = net((torch.from_numpy(audio),
                     torch.from_numpy(steps.astype(np.float32)).view(2, 1)),
                    mel_spec=torch.from_numpy(mel))
    y_ref = y_ref.numpy()

    params = sashimi_from_torch(net.state_dict(), n_layers=n_layers,
                                pool=[4, 4], conditional=True)
    model = Sashimi(d_model=d_model, n_layers=n_layers, pool=(4, 4), L=L,
                    unconditional=False, mel_upsample=mel_up)
    y_ours = np.asarray(model.apply({"params": params}, audio, steps, mel))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-3, rtol=1e-2)


def test_sashimi_nonpow2_length_parity(torch_ref):
    """Regression: at L where next_pow2(L + L_kernel) > L + L_kernel, the
    bidirectional anticausal taps must sit at the END of the FFT buffer.
    (Placing them at [L, L+L_k) like the reference's exact-size buffer
    silently shifts every anticausal tap — invisible at pow2 L like 256,
    live at the production L=16000.)"""
    torch = torch_ref.torch
    d_model, n_layers, L = 8, 1, 320  # L+L_k = 640, fft size 1024
    net = _make_ref(torch_ref, d_model=d_model, n_layers=n_layers, L=L)

    rng = np.random.RandomState(2)
    audio = rng.randn(2, 1, L).astype(np.float32)
    steps = np.array([11, 60])
    with torch.no_grad():
        y_ref = net((torch.from_numpy(audio),
                     torch.from_numpy(steps.astype(np.float32)).view(2, 1)))
    y_ref = y_ref.numpy()

    params = sashimi_from_torch(net.state_dict(), n_layers=n_layers,
                                pool=[4, 4])
    model = Sashimi(d_model=d_model, n_layers=n_layers, pool=(4, 4), L=L)
    y_ours = np.asarray(model.apply({"params": params}, audio, steps))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-3, rtol=1e-2)

    # and through the precomputed-kernel (sampling) path
    kf = model.apply({"params": params}, L, True,
                     method=Sashimi.compute_kernels)
    y_k = np.asarray(model.apply({"params": params}, audio, steps, None, kf))
    np.testing.assert_allclose(y_k, y_ref, atol=1e-3, rtol=1e-2)


def test_sashimi_precomputed_kernels_match(sashimi_small):
    # shared session fixture: compiling a SECOND standalone block-scan
    # init program late in the suite segfaults XLA:CPU (eager and jitted
    # alike) — reuse the one compile from conftest.sashimi_small
    model, params = sashimi_small
    L = model.L
    kernels = jax.jit(lambda p: model.apply(
        p, L, method=Sashimi.compute_kernels))(params)
    # n_layers=1, pool=(4,4), unet: d0, d1, c, u0, u1 -> 5 block kernels
    assert len(kernels) == 5
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 1, L))
    steps = jnp.array([5, 6])
    y1 = jax.jit(model.apply)(params, audio, steps)
    y2 = jax.jit(model.apply)(params, audio, steps, None, kernels)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_sashimi_param_count_matches_reference(torch_ref):
    net = _make_ref(torch_ref, d_model=8, n_layers=1, L=256)
    n_ref = sum(p.numel() for p in net.parameters())
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=256)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 256)),
                        jnp.zeros((1,), jnp.int32))
    n_ours = sum(p.size for p in jax.tree.leaves(params))
    assert n_ours == n_ref


def test_block_scan_equivalent_to_unrolled():
    """block_scan layout must be numerically identical to the unrolled one
    given restacked parameters."""
    import jax.numpy as jnp
    from diffwave_sashimi_tpu.utils.torch_compat import stack_sashimi_blocks

    L, n_layers = 256, 2
    un = Sashimi(d_model=8, n_layers=n_layers, pool=(4, 4), L=L,
                 block_scan=False)
    # jitted: ONE compile unit instead of dozens of eager per-op compiles
    # (each an XLA:CPU segfault opportunity late in the suite)
    params = jax.jit(un.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)),
                              jnp.zeros((1,), jnp.int32))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 1, L))
    steps = jnp.array([3, 9])
    y_un = jax.jit(un.apply)(params, audio, steps)

    sc = Sashimi(d_model=8, n_layers=n_layers, pool=(4, 4), L=L,
                 block_scan=True)
    stacked = {"params": stack_sashimi_blocks(
        jax.tree.map(np.asarray, params["params"]), n_layers, [4, 4])}
    y_sc = jax.jit(sc.apply)(stacked, audio, steps)
    np.testing.assert_allclose(np.asarray(y_sc), np.asarray(y_un),
                               atol=2e-5, rtol=1e-3)

    # and with precomputed freq kernels
    kf = jax.jit(lambda p: sc.apply(
        p, L, True, method=Sashimi.compute_kernels))(stacked)
    y_k = jax.jit(sc.apply)(stacked, audio, steps, None, kf)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_un),
                               atol=2e-5, rtol=1e-3)
