"""S4 layer parity: kernels and forwards vs the reference torch code.

Weights flow torch -> flax via utils.torch_compat.  The reference applies its
lazy C -> C~ transform on first forward, so each oracle runs one forward
before exporting its state_dict.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.models.s4 import S4, SSKernelNPLR, _r2c
from diffwave_sashimi_tpu.ops.cauchy import cauchy_sym, cauchy_sym_naive
from diffwave_sashimi_tpu.utils.torch_compat import _s4_from_torch


def test_cauchy_sym_matches_naive():
    rng = np.random.RandomState(0)
    A, B, H, N, L = 2, 3, 4, 16, 301
    v = (rng.randn(A, B, H, N) + 1j * rng.randn(A, B, H, N)).astype(np.complex64)
    w = (-np.abs(rng.randn(H, N)) + 1j * rng.randn(H, N)).astype(np.complex64)
    z = (1j * rng.randn(L)).astype(np.complex64)

    ours = np.asarray(cauchy_sym(jnp.asarray(v), jnp.asarray(z), jnp.asarray(w),
                                 chunk=64))
    oracle = np.asarray(cauchy_sym_naive(jnp.asarray(v), jnp.asarray(z),
                                         jnp.asarray(w)))
    # f64 ground truth
    vv = np.concatenate([v, v.conj()], axis=-1).astype(np.complex128)
    ww = np.concatenate([w, w.conj()], axis=-1).astype(np.complex128)
    exact = (vv[..., None] / (z.astype(np.complex128) - ww[..., None])).sum(-2)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours, exact, rtol=1e-3, atol=1e-3)


def test_cauchy_grad_finite():
    rng = np.random.RandomState(1)
    H, N, L = 2, 8, 65
    v = jnp.asarray((rng.randn(1, 1, H, N) + 1j * rng.randn(1, 1, H, N))
                    .astype(np.complex64))
    w = jnp.asarray((-np.abs(rng.randn(H, N)) + 1j * rng.randn(H, N))
                    .astype(np.complex64))
    z = jnp.asarray((1j * rng.randn(L)).astype(np.complex64))

    def f(v, w):
        return jnp.sum(jnp.abs(cauchy_sym(v, z, w, chunk=32)) ** 2)

    gv, gw = jax.grad(f, argnums=(0, 1))(v, w)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gw)).all()


@pytest.fixture(scope="module")
def ref_s4_factory(torch_ref):
    torch = torch_ref.torch

    def make(H=8, N=16, L=256, bidirectional=True, seed=0):
        from models.s4 import S4 as RefS4
        torch.manual_seed(seed)
        layer = RefS4(d_model=H, d_state=N, l_max=L,
                      bidirectional=bidirectional)
        layer.eval()
        # trigger lazy C -> C~ setup
        with torch.no_grad():
            layer(torch.zeros(1, H, L))
        return layer

    return make


def _import_s4_params(layer, prefix=""):
    sd = {k: v for k, v in layer.state_dict().items()}
    return _s4_from_torch(sd, prefix="" if not prefix else prefix)


def test_nplr_kernel_parity(torch_ref, ref_s4_factory):
    torch = torch_ref.torch
    H, N, L = 8, 16, 256
    layer = ref_s4_factory(H=H, N=N, L=L)

    with torch.no_grad():
        k_ref, _ = layer.kernel(L=L, rate=1.0)
    k_ref = k_ref.numpy()  # (c=2, H, L)

    sd = {("x." + k): v for k, v in layer.state_dict().items()}
    ours_params = _s4_from_torch(sd, "x")

    mod = SSKernelNPLR(H=H, N=N, l_max=L, channels=2)
    k_ours = mod.apply({"params": ours_params["kernel"]}, L)
    np.testing.assert_allclose(np.asarray(k_ours), k_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("rate", [2.0, 0.5])
def test_nplr_kernel_rate_parity(torch_ref, ref_s4_factory, rate):
    """Kernel-level rate resampling (ref models/s4.py:689-702): the
    continuous support stays l_max while the discrete grid is resampled
    by ``rate`` (dt * rate; doubling when rate * L exceeds the trained
    length).  Pins the kernel itself, not just the layer forward
    (test_s4_options covers that)."""
    torch = torch_ref.torch
    H, N, L = 8, 16, 256
    layer = ref_s4_factory(H=H, N=N, L=L)
    Lk = int(round(L / rate))

    sd = {("x." + k): v.clone() for k, v in layer.state_dict().items()}
    with torch.no_grad():
        k_ref, _ = layer.kernel(L=Lk, rate=rate)
    k_ref = k_ref.numpy()  # (c=2, H, Lk)

    ours_params = _s4_from_torch(sd, "x")
    mod = SSKernelNPLR(H=H, N=N, l_max=L, channels=2)
    k_ours = np.asarray(mod.apply({"params": ours_params["kernel"]},
                                  Lk, rate=rate))
    np.testing.assert_allclose(k_ours, k_ref, atol=5e-4, rtol=1e-2)


def test_s4_forward_parity(torch_ref, ref_s4_factory):
    torch = torch_ref.torch
    H, N, L = 8, 16, 256
    layer = ref_s4_factory(H=H, N=N, L=L)

    rng = np.random.RandomState(3)
    u = rng.randn(2, H, L).astype(np.float32)
    with torch.no_grad():
        y_ref, _ = layer(torch.from_numpy(u))
    y_ref = y_ref.numpy()

    sd = {("x." + k): v for k, v in layer.state_dict().items()}
    params = _s4_from_torch(sd, "x")
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=True)
    y_ours = np.asarray(mod.apply({"params": params}, jnp.asarray(u)))
    np.testing.assert_allclose(y_ours, y_ref, atol=5e-4, rtol=1e-2)


def test_s4_precomputed_kernel_same_result():
    H, N, L = 4, 8, 64
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, H, L)))
    u = jax.random.normal(jax.random.PRNGKey(1), (2, H, L))
    y1 = mod.apply(params, u)
    kern = mod.apply(params, L, method=S4.compute_kernel)
    y2 = mod.apply(params, u, kernel=kern)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_s4_shorter_sequence_truncates_kernel():
    # L < l_max: kernel truncated, no error (ref S4.forward L_kernel=min(...))
    H, N, L = 4, 8, 128
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=True)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, H, L)))
    y = jax.jit(mod.apply)(params, jnp.zeros((1, H, 32)))
    assert y.shape == (1, H, 32)


def test_s4d_diag_kernel_runs():
    H, N, L = 4, 8, 64
    mod = S4(d_model=H, d_state=N, l_max=L, mode="diag", measure="diag-lin",
             bidirectional=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, H, L)))
    y = mod.apply(params, jax.random.normal(jax.random.PRNGKey(1), (2, H, L)))
    assert y.shape == (2, H, L)
    assert np.isfinite(np.asarray(y)).all()


def test_kernel_doubling_beyond_trained_length(torch_ref, ref_s4_factory):
    """L > l_max: the functional C~ doubling (ops/nplr.extend_C) must match
    the reference's in-place buffer-doubling (_setup_C double_length mode)."""
    torch = torch_ref.torch
    H, N, L = 4, 8, 64
    layer = ref_s4_factory(H=H, N=N, L=L)

    # export weights BEFORE the 2L request: the reference's doubling mutates
    # its C buffer in place (exactly the statefulness we replaced)
    sd = {("x." + k): v.clone() for k, v in layer.state_dict().items()}

    with torch.no_grad():
        k_ref, _ = layer.kernel(L=2 * L, rate=1.0)
    k_ref = k_ref.numpy()  # (c=2, H, 2L)
    ours_params = _s4_from_torch(sd, "x")
    mod = SSKernelNPLR(H=H, N=N, l_max=L, channels=2)
    k_ours = np.asarray(mod.apply({"params": ours_params["kernel"]}, 2 * L))
    np.testing.assert_allclose(k_ours, k_ref, atol=5e-4, rtol=1e-2)
