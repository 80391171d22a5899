"""The shifted-matmul dilated-conv path (ops/conv.SHIFT_MM, the TPU
formulation of WaveNet's dilated Conv1d as k channel contractions at
static lane offsets) must match lax.conv_general_dilated exactly —
forward and gradients — at every dilation the reference uses
(2^(n % dilation_cycle), ref models/wavenet.py:95)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffwave_sashimi_tpu.ops import conv as C


@pytest.fixture(autouse=True)
def _restore_toggle():
    yield
    C.set_shift_mm(None)


@pytest.mark.parametrize("dilation", [1, 2, 8, 64, 512])
def test_shift_mm_matches_conv(dilation):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 2048).astype(np.float32))
    w = jnp.asarray(rs.randn(8, 16, 3).astype(np.float32))
    C.set_shift_mm(False)
    ref = C.conv1d_ncl(x, w, dilation=dilation)
    C.set_shift_mm(True)
    got = C.conv1d_ncl(x, w, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_shift_mm_grads_match():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 1024).astype(np.float32))
    w = jnp.asarray(rs.randn(4, 8, 3).astype(np.float32))

    def loss(w, x):
        return jnp.sum(C.conv1d_ncl(x, w, dilation=4) ** 2)

    C.set_shift_mm(False)
    gw0, gx0 = jax.grad(loss, argnums=(0, 1))(w, x)
    C.set_shift_mm(True)
    gw1, gx1 = jax.grad(loss, argnums=(0, 1))(w, x)
    # accumulation order differs (k matmul VJPs vs one conv VJP): allow
    # f32 roundoff at the gradient's scale, not per-element rtol
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), rtol=1e-4,
                               atol=1e-4 * float(np.abs(gw0).max()))
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=1e-4,
                               atol=1e-4 * float(np.abs(gx0).max()))
