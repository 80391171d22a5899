"""Parity of the S4 constructor option surface vs the reference torch S4
(reference models/s4.py:1284-1300, 1376-1437): activation/postact/
hyper_act/linear/shift/transposed, forward(rate=...), and
forward(state=...) with state forwarding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.models.s4 import S4
from diffwave_sashimi_tpu.utils.torch_compat import _s4_from_torch

H, N, L = 8, 16, 128


@pytest.fixture(scope="module")
def make_pair(torch_ref):
    """Build (ref torch layer, our flax module + params) for given options."""
    torch = torch_ref.torch

    def make(seed=0, forward_len=None, **opts):
        from models.s4 import S4 as RefS4
        torch.manual_seed(seed)
        layer = RefS4(d_model=H, d_state=N, l_max=L, **opts)
        layer.eval()
        with torch.no_grad():  # trigger lazy C -> C~ setup
            u0 = torch.zeros(1, H, forward_len or L)
            if not opts.get("transposed", True):
                u0 = u0.transpose(-1, -2)
            layer(u0)
        sd = {("x." + k): v for k, v in layer.state_dict().items()}
        flax_opts = dict(
            d_model=H, d_state=N, l_max=L,
            bidirectional=opts.get("bidirectional", False),
            activation=opts.get("activation", "gelu"),
            postact=opts.get("postact", "glu"),
            hyper_act=opts.get("hyper_act", None),
            transposed=opts.get("transposed", True),
            shift=opts.get("shift", False),
            linear=opts.get("linear", False))
        mod = S4(**flax_opts)
        params = _s4_from_torch(sd, "x")
        return layer, mod, params

    return make


def _run_pair(torch_ref, layer, mod, params, u, transposed=True, **kw):
    torch = torch_ref.torch
    ut = torch.from_numpy(u)
    with torch.no_grad():
        y_ref, _ = layer(ut, **{k: torch.from_numpy(np.asarray(v))
                                if isinstance(v, np.ndarray) else v
                                for k, v in kw.items()})
    y = mod.apply({"params": params}, jnp.asarray(u), **kw)
    if isinstance(y, tuple):
        y = y[0]
    return np.asarray(y), y_ref.numpy()


@pytest.mark.parametrize("opts", [
    dict(activation="relu", postact=None),
    dict(activation="tanh", postact="sigmoid"),
    dict(linear=True),
    dict(hyper_act="tanh"),
    dict(shift=True),
    dict(bidirectional=True, activation="swish"),
])
def test_s4_option_forward_parity(torch_ref, make_pair, opts):
    layer, mod, params = make_pair(**opts)
    rng = np.random.RandomState(1)
    u = rng.randn(2, H, L).astype(np.float32)
    ours, ref = _run_pair(torch_ref, layer, mod, params, u)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)


def test_s4_transposed_false(torch_ref, make_pair):
    layer, mod, params = make_pair(transposed=False)
    rng = np.random.RandomState(2)
    u = rng.randn(2, L, H).astype(np.float32)   # (B, L, H) layout
    ours, ref = _run_pair(torch_ref, layer, mod, params, u)
    assert ours.shape == (2, L, H)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)


@pytest.mark.parametrize("rate", [2.0, 0.5])
def test_s4_rate_resampling_parity(torch_ref, make_pair, rate):
    """ref models/s4.py:689-702: continuous support l_max, discrete grid
    resampled by ``rate``."""
    layer, mod, params = make_pair()
    rng = np.random.RandomState(3)
    Lu = int(L // max(rate, 1.0))
    u = rng.randn(2, H, Lu).astype(np.float32)
    torch = torch_ref.torch
    with torch.no_grad():
        y_ref, _ = layer(torch.from_numpy(u), rate=rate)
    y = mod.apply({"params": params}, jnp.asarray(u), rate=rate)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(),
                               atol=5e-4, rtol=1e-2)


def test_s4_state_forward_parity(torch_ref, make_pair):
    """forward(state=...): y includes the initial-state response and the
    returned next_state matches a brute-force recurrence over (dA, dB).

    NOTE: the reference's own ``SSKernel.forward_state`` is broken —
    ``SSKernelNPLR._setup_state`` computes (dA, dB) but the attribute
    assignment is commented out (ref models/s4.py:893), so
    ``self.kernel.dA`` raises AttributeError.  We therefore oracle the
    state-response y against the reference forward (with forward_state
    stubbed) and next_state against an f64 step-by-step recurrence using
    the reference's own _setup_state matrices.
    """
    torch = torch_ref.torch
    layer, mod, params = make_pair()
    rng = np.random.RandomState(4)
    u = rng.randn(2, H, L).astype(np.float32)
    st = (rng.randn(2, H, N // 2) + 1j * rng.randn(2, H, N // 2)) \
        .astype(np.complex64)

    with torch.no_grad():
        dA, dB = layer.kernel.kernel._setup_state()   # returns, not stores
    dA, dB = dA.numpy().astype(np.complex128), dB.numpy().astype(np.complex128)
    layer.kernel.forward_state = lambda uu, ss: torch.zeros(1)  # stub the bug
    with torch.no_grad():
        y_ref, _ = layer(torch.from_numpy(u), state=torch.from_numpy(st))

    # brute-force next_state oracle: x_L = dA^L x_0 + sum dA^i dB u_{L-1-i}
    x = np.concatenate([st, st.conj()], axis=-1).astype(np.complex128)
    for t in range(L):
        x = np.einsum("hmn,bhn->bhm", dA, x) + dB[None] * u[:, :, t, None]
    ns_ref = x[..., : N // 2]

    y, ns = mod.apply({"params": params}, jnp.asarray(u),
                      state=jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(ns), ns_ref,
                               atol=2e-3, rtol=1e-2)
