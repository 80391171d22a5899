"""Correctness of the v2 layout-native fused convolution (ops/fftconv2.py)
against a direct rfft/irfft oracle, including the Nyquist fixup, the
compact-layout round trip, gradients, and the fused epilogue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.ops import fftconv2 as f2


def _direct(u_flat, k_time, n, L):
    """Oracle: y = irfft(rfft(u, n) * rfft(k, n), n)[:L] in f64."""
    U = np.fft.rfft(u_flat.astype(np.float64), n=n, axis=-1)
    K = np.fft.rfft(k_time.astype(np.float64), n=n, axis=-1)
    return np.fft.irfft(U * K, n=n, axis=-1)[..., :L]


@pytest.mark.parametrize("L,n,B,H", [(1000, 2048, 2, 16),
                                     (4000, 8192, 1, 8),
                                     (500, 1024, 3, 8)])
def test_conv2_matches_direct(L, n, B, H):
    lay = f2.choose_layout(L, n, H)
    rng = np.random.RandomState(0)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, min(n, 2 * L)).astype(np.float32) * 0.3

    y_ref = _direct(u, k, n, L)

    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)
    yc = f2.fftconv2(uc, kfr, kfi, lay, False)
    y = np.asarray(f2.from_compact(yc, lay, L))
    np.testing.assert_allclose(y, y_ref, atol=2e-3, rtol=1e-3)

    # the pure-XLA reference path agrees too
    yc2 = f2.conv2_ref(uc, kfr, kfi, lay)
    np.testing.assert_allclose(np.asarray(f2.from_compact(yc2, lay, L)),
                               y_ref, atol=2e-3, rtol=1e-3)


def test_conv2_compact_roundtrip():
    lay = f2.choose_layout(1000, 2048, 8)
    x = jnp.arange(2 * 8 * 1000, dtype=jnp.float32).reshape(2, 8, 1000)
    xc = f2.to_compact(x, lay)
    assert xc.shape == (2, lay.S, 8, lay.Rc)
    np.testing.assert_array_equal(np.asarray(f2.from_compact(xc, lay, 1000)),
                                  np.asarray(x))


def test_conv2_grads_match_ref():
    L, n, B, H = 504, 1024, 2, 8
    lay = f2.choose_layout(L, n, H)
    rng = np.random.RandomState(1)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, n).astype(np.float32) * 0.3
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)

    def loss_fast(uu, a, b):
        return jnp.sum(jnp.sin(f2.fftconv2(uu, a, b, lay, False)))

    def loss_ref(uu, a, b):
        return jnp.sum(jnp.sin(f2.conv2_ref(uu, a, b, lay)))

    g1 = jax.grad(loss_fast, argnums=(0, 1, 2))(uc, kfr, kfi)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(uc, kfr, kfi)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_conv2_gelu_d_epilogue():
    L, n, B, H = 1000, 2048, 2, 16
    lay = f2.choose_layout(L, n, H)
    rng = np.random.RandomState(2)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, n).astype(np.float32) * 0.3
    d = rng.randn(H).astype(np.float32)
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)

    y_conv = _direct(u, k, n, L)
    pre = y_conv + d[None, :, None] * u
    import math
    y_ref = 0.5 * pre * (1 + np.vectorize(math.erf)(pre / np.sqrt(2.0)))

    yc = f2.fftconv2_gelu_d(uc, kfr, kfi, jnp.asarray(d), lay, False)
    y = np.asarray(f2.from_compact(yc, lay, L))
    np.testing.assert_allclose(y, y_ref, atol=2e-3, rtol=1e-3)


def test_conv2_kernel_hb1_interpret():
    """The all-2-D HB=1 kernel path (used by long-L tiers whose frame
    only fits one channel per program, e.g. the 44000-sample vocoder
    top tier) — interpret-mode kernel vs the XLA reference, with and
    without the prologue/epilogue fusions."""
    L, n, B, H = 1000, 2048, 2, 8
    lay = f2.choose_layout(L, n, H, HB=1)
    assert lay.HB == 1
    rng = np.random.RandomState(3)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, n).astype(np.float32) * 0.3
    d = rng.randn(H).astype(np.float32)
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)

    y_ker = f2._conv2_impl(uc, kfr, kfi, None, lay, False, "none")
    y_ref = f2.conv2_ref(uc, kfr, kfi, lay)
    np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)

    # prologue (LN scale/shift + channel bias) + D-skip + GELU epilogue
    a = rng.randn(B, lay.S, lay.Rc).astype(np.float32) * 0.1 + 1.0
    c = rng.randn(B, lay.S, lay.Rc).astype(np.float32) * 0.1
    bias = rng.randn(B, H).astype(np.float32)
    y_ker2 = f2._conv2_impl(uc, kfr, kfi,
                            jnp.asarray(d).reshape(H, lay.HB, 1),
                            lay, False, "gelu_d",
                            prologue=(jnp.asarray(a), jnp.asarray(c),
                                      jnp.asarray(bias)))
    m = f2._consts(lay)["mask"][None, :, None, :]
    xn = (np.asarray(uc) * a[:, :, None, :] + c[:, :, None, :]
          + bias[:, None, :, None])
    y_pre = np.asarray(f2.conv2_ref(jnp.asarray(xn.astype(np.float32)),
                                    kfr, kfi, lay))
    pre = y_pre + d[None, None, :, None] * (xn * np.asarray(m))
    import math
    y_ref2 = (0.5 * pre * (1 + np.vectorize(math.erf)(pre / np.sqrt(2.0)))
              * np.asarray(m))
    np.testing.assert_allclose(np.asarray(y_ker2), y_ref2,
                               atol=2e-3, rtol=1e-3)


def test_conv2_kernel_bb2_interpret():
    """The BB=2 batch-interleaved kernel path (the measured v5e default
    for S >= 16 tiers: two independent per-item chains per program) —
    interpret-mode kernel vs the XLA reference, plus the trace-time BB
    downgrade when the batch doesn't divide BB."""
    L, n, B, H = 4000, 8192, 4, 8
    lay = f2.choose_layout(L, n, H)
    assert lay.HB == 8 and lay.BB == 2, lay   # the auto pick under test
    rng = np.random.RandomState(5)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, n).astype(np.float32) * 0.3
    d = rng.randn(H).astype(np.float32)
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)

    y_ker = f2._conv2_impl(uc, kfr, kfi, None, lay, False, "none")
    y_ref = f2.conv2_ref(uc, kfr, kfi, lay)
    np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)

    # prologue + epilogue through the BB loop
    a = rng.randn(B, lay.S, lay.Rc).astype(np.float32) * 0.1 + 1.0
    c = rng.randn(B, lay.S, lay.Rc).astype(np.float32) * 0.1
    bias = rng.randn(B, H).astype(np.float32)
    y_ker2 = f2._conv2_impl(uc, kfr, kfi,
                            jnp.asarray(d).reshape(H // lay.HB, lay.HB, 1),
                            lay, False, "gelu_d",
                            prologue=(jnp.asarray(a), jnp.asarray(c),
                                      jnp.asarray(bias)))
    m = f2._consts(lay)["mask"][None, :, None, :]
    xn = (np.asarray(uc) * a[:, :, None, :] + c[:, :, None, :]
          + bias[:, None, :, None])
    y_pre = np.asarray(f2.conv2_ref(jnp.asarray(xn.astype(np.float32)),
                                    kfr, kfi, lay))
    pre = y_pre + d[None, None, :, None] * (xn * np.asarray(m))
    import math
    y_ref2 = (0.5 * pre * (1 + np.vectorize(math.erf)(pre / np.sqrt(2.0)))
              * np.asarray(m))
    np.testing.assert_allclose(np.asarray(y_ker2), y_ref2,
                               atol=2e-3, rtol=1e-3)

    # odd batch: BB downgraded at trace time, same values
    y3 = f2._conv2_impl(uc[:3], kfr, kfi, None, lay, False, "none")
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y_ref)[:3],
                               atol=2e-4, rtol=1e-3)


def test_dkf_kernel_hb1_interpret():
    L, n, H, B = 1000, 2048, 8, 2
    lay = f2.choose_layout(L, n, H, HB=1)
    rng = np.random.RandomState(4)
    u = jnp.asarray(rng.randn(B, lay.S, H, lay.Rc).astype(np.float32) * 0.3)
    k = rng.randn(H, n).astype(np.float32) * 0.3
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    g = jnp.asarray(rng.randn(B, lay.S, H, lay.Rc).astype(np.float32))
    _, vjp_k = jax.vjp(lambda a, b: f2.conv2_ref(u, a, b, lay), kfr, kfi)
    dr_ref, di_ref = vjp_k(g)
    dr, di = f2.fftconv2_dkf(u, g, lay, False)
    live = np.ones((1, lay.Q, 1, lay.R), bool)
    live[:, lay.Q - 1, :, 1:] = False
    scale = np.abs(np.asarray(dr_ref)).max()
    assert (np.abs(np.asarray(dr) - np.asarray(dr_ref)) * live).max() \
        / scale < 1e-5
    live[:, lay.Q - 1] = False
    assert (np.abs(np.asarray(di) - np.asarray(di_ref)) * live).max() \
        / scale < 1e-5


def test_dkf_kernel_matches_autodiff():
    """The fused spectrum-gradient kernel (interpret mode) vs jax.vjp of
    the XLA reference, on the live components (dead components: Nyquist
    alias lanes / Nyquist imag row are killed by kernel_spectrum's
    c-fold upstream)."""
    for (L, n, H) in [(1000, 2048, 16), (500, 1024, 8)]:
        lay = f2.choose_layout(L, n, H)
        rng = np.random.RandomState(0)
        B = 3
        u = jnp.asarray(rng.randn(B, lay.S, H, lay.Rc).astype(np.float32)
                        * 0.3)
        k = rng.randn(H, n).astype(np.float32) * 0.3
        kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
        g = jnp.asarray(rng.randn(B, lay.S, H, lay.Rc).astype(np.float32))
        _, vjp_k = jax.vjp(lambda a, b: f2.conv2_ref(u, a, b, lay),
                           kfr, kfi)
        dr_ref, di_ref = vjp_k(g)
        dr, di = f2.fftconv2_dkf(u, g, lay, False)
        live = np.ones((lay.Q, 1, lay.R), bool)
        live[lay.Q - 1, :, 1:] = False          # Nyquist alias lanes
        scale = np.abs(np.asarray(dr_ref)).max()
        err_r = (np.abs(np.asarray(dr) - np.asarray(dr_ref))
                 * live[None]).max()
        live_i = live.copy()
        live_i[lay.Q - 1] = False               # whole Nyquist imag row
        err_i = (np.abs(np.asarray(di) - np.asarray(di_ref))
                 * live_i[None]).max()
        assert err_r / scale < 1e-5, (L, err_r / scale)
        assert err_i / scale < 1e-5, (L, err_i / scale)


@pytest.mark.parametrize("HB_override", [None, 1])
def test_conv2_int8_interpret(HB_override):
    """int8 MXU stage path (interpret mode): quantized DFT matmuls must
    track the f64 oracle within the documented int8 budget (~per-stage
    0.4%-scale quantization through a 4-dot chain -> rel tol 3e-2 on the
    conv output), and the result must be layout-invariant (HB=1 all-2-D
    chain vs channel-grouped)."""
    L, n, B, H = 1000, 2048, 2, 16
    lay = f2.choose_layout(L, n, H, HB=HB_override)
    rng = np.random.RandomState(3)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, min(n, 2 * L)).astype(np.float32) * 0.3

    y_ref = _direct(u, k, n, L)
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)
    yc = f2._conv2_impl(uc, kfr, kfi, None, lay, True, "none", int8=True)
    y = np.asarray(f2.from_compact(yc, lay, L), np.float64)
    scale = np.max(np.abs(y_ref))
    rel = np.max(np.abs(y - y_ref)) / scale
    assert rel < 3e-2, rel
    # and it must really differ from the exact path (i.e. int8 ran)
    yc_exact = f2._conv2_impl(uc, kfr, kfi, None, lay, False, "none")
    assert not np.allclose(np.asarray(yc), np.asarray(yc_exact))


def test_conv2_int8_toggle_routes_epilogue():
    """set_int8 routes the eval epilogue kernels through the int8 stage
    path (checked by output difference on TPU-shaped call; interpret mode
    routes to conv2_ref, so here we call _conv2_impl directly with the
    gelu_d epilogue)."""
    L, n, B, H = 500, 1024, 1, 8
    lay = f2.choose_layout(L, n, H)
    rng = np.random.RandomState(4)
    u = rng.randn(B, H, L).astype(np.float32)
    k = rng.randn(H, min(n, 2 * L)).astype(np.float32) * 0.3
    d = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k), lay)
    uc = f2.to_compact(jnp.asarray(u), lay)
    d3 = d.reshape(H // lay.HB, lay.HB, 1)
    y8 = f2._conv2_impl(uc, kfr, kfi, d3, lay, True, "gelu_d", int8=True)
    yx = f2._conv2_impl(uc, kfr, kfi, d3, lay, False, "gelu_d")
    rel = (np.max(np.abs(np.asarray(y8, np.float64)
                         - np.asarray(yx, np.float64)))
           / np.max(np.abs(np.asarray(yx))))
    assert rel < 3e-2, rel
