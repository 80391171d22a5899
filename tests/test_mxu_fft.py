"""MXU four-step FFT vs numpy oracle (sizes used by the S4 conv path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from diffwave_sashimi_tpu.ops.mxu_fft import rfft_mxu, irfft_mxu


@pytest.mark.parametrize("n", [16, 64, 256, 2048, 4096, 32768])
def test_rfft_matches_numpy(n):
    rng = np.random.RandomState(0)
    L = n if n <= 64 else n - 13   # exercise the zero-pad path
    x = rng.randn(2, 3, L).astype(np.float32)
    ref = np.fft.rfft(x, n=n).astype(np.complex64)
    out = np.asarray(rfft_mxu(jnp.asarray(x), n))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4 * max(1, n / 2048),
                               rtol=1e-4)


@pytest.mark.parametrize("n", [16, 256, 4096, 32768])
def test_irfft_matches_numpy(n):
    rng = np.random.RandomState(1)
    X = (rng.randn(2, n // 2 + 1) + 1j * rng.randn(2, n // 2 + 1)
         ).astype(np.complex64)
    ref = np.fft.irfft(X, n=n).astype(np.float32)
    out = np.asarray(irfft_mxu(jnp.asarray(X), n))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 1000).astype(np.float32)
    n = 2048
    rec = np.asarray(irfft_mxu(rfft_mxu(jnp.asarray(x), n), n))
    np.testing.assert_allclose(rec[:, :1000], x, atol=1e-5)
    np.testing.assert_allclose(rec[:, 1000:], 0.0, atol=1e-5)


def test_linear_convolution_equivalence():
    """FFT conv with MXU transforms == direct convolution."""
    rng = np.random.RandomState(3)
    L = 500
    u = rng.randn(2, L).astype(np.float32)
    k = rng.randn(L).astype(np.float32)
    n = 2048  # >= 2L-1
    y_ref = np.stack([np.convolve(u[i], k)[:L] for i in range(2)])
    Y = rfft_mxu(jnp.asarray(u), n) * rfft_mxu(jnp.asarray(k[None]), n)
    y = np.asarray(irfft_mxu(Y, n))[:, :L]
    np.testing.assert_allclose(y, y_ref, atol=1e-3, rtol=1e-4)
