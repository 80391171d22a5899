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


def test_fast_flag_not_baked_into_jit_cache():
    """The bf16 fast mode must be a cache key, not a trace-time global.

    Regression: rfft_mxu/irfft_mxu were jitted with the module fast-toggle
    read inside the traced body — whichever mode traced FIRST for a given
    shape was silently reused for both modes (set_fast_mode was a no-op
    after any strict call).  Tripped 2026-08-18 measuring the kernel-
    construction precision lever on TPU (the "fast" variant cache-hit the
    strict program: 0 s compile, identical timings).
    """
    rng = np.random.RandomState(4)
    n = 4096
    x = rng.randn(3, n).astype(np.float32)
    strict = np.asarray(rfft_mxu(jnp.asarray(x), n, fast=False))
    fast = np.asarray(rfft_mxu(jnp.asarray(x), n, fast=True))
    # different precision => different roundoff; identical bits means the
    # flag was ignored
    assert np.any(strict != fast)
    # and both are still correct transforms
    ref = np.fft.rfft(x, n=n).astype(np.complex64)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(strict - ref)) / scale < 1e-5
    assert np.max(np.abs(fast - ref)) / scale < 2e-2

    Xc = (rng.randn(3, n // 2 + 1)
          + 1j * rng.randn(3, n // 2 + 1)).astype(np.complex64)
    s_i = np.asarray(irfft_mxu(jnp.asarray(Xc), n, fast=False))
    f_i = np.asarray(irfft_mxu(jnp.asarray(Xc), n, fast=True))
    assert np.any(s_i != f_i)
    ref_i = np.fft.irfft(Xc, n=n).astype(np.float32)
    scale = np.max(np.abs(ref_i))
    assert np.max(np.abs(s_i - ref_i)) / scale < 1e-5
    assert np.max(np.abs(f_i - ref_i)) / scale < 2e-2


def test_high_mode_plumbing_and_accuracy():
    """"high" (bf16x3, Precision.HIGH) mode: accepted by the public API,
    distinct jit-cache key, and at least f32-class accurate off-TPU (on
    CPU HIGH lowers to plain f32; the on-chip 3-pass accuracy is guarded
    by scripts/kern_ablation.py / scripts/tpu_smoke.py)."""
    rng = np.random.RandomState(5)
    n = 4096
    x = rng.randn(3, n).astype(np.float32)
    ref = np.fft.rfft(x, n=n).astype(np.complex64)
    scale = np.max(np.abs(ref))
    out = np.asarray(rfft_mxu(jnp.asarray(x), n, fast="high"))
    assert np.max(np.abs(out - ref)) / scale < 1e-5
    y = np.asarray(irfft_mxu(jnp.asarray(ref), n, fast="high"))
    np.testing.assert_allclose(y, x, atol=1e-4)
    with pytest.raises(ValueError):
        rfft_mxu(jnp.asarray(x), n, fast="bogus")
