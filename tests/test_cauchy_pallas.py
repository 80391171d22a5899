"""Pallas Cauchy kernel vs naive oracle (interpret mode on CPU).

The TPU-compiled path is exercised by bench.py and the TPU smoke script;
here the same kernel code runs under the Pallas interpreter, mirroring the
reference's CUDA-vs-double-precision-oracle strategy
(extensions/cauchy/test_cauchy.py:53-95).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffwave_sashimi_tpu.ops.cauchy import cauchy_sym_naive
from diffwave_sashimi_tpu.ops.cauchy_pallas import cauchy_sym_pallas


def _data(A, B, H, N, L, seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray((rng.randn(A, B, H, N) + 1j * rng.randn(A, B, H, N))
                    .astype(np.complex64))
    w = jnp.asarray((-np.abs(rng.randn(H, N)) + 1j * rng.randn(H, N))
                    .astype(np.complex64))
    z = jnp.asarray((0.1 + 1j * rng.randn(L)).astype(np.complex64))
    return v, z, w


# L values probe padding edges: < BL, == BL, non-multiple, multi-tile
@pytest.mark.parametrize("L", [3, 129, 512, 513, 1047])
@pytest.mark.parametrize("N", [4, 16, 32])
def test_forward_matches_naive(N, L):
    v, z, w = _data(2, 3, 4, N, L)
    out = cauchy_sym_pallas(v, z, w)
    ref = cauchy_sym_naive(v, z, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_gradients_match_naive():
    v, z, w = _data(2, 2, 3, 16, 300, seed=1)

    def loss_p(v, w):
        return jnp.sum(jnp.abs(cauchy_sym_pallas(v, z, w)) ** 2)

    def loss_n(v, w):
        return jnp.sum(jnp.abs(cauchy_sym_naive(v, z, w)) ** 2)

    gv_p, gw_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(v, w)
    gv_n, gw_n = jax.jit(jax.grad(loss_n, argnums=(0, 1)))(v, w)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-4)


def test_m_not_multiple_of_tile():
    # M = A*B*H = 1*1*3 -> padded to 8 rows; padded rows must not pollute
    v, z, w = _data(1, 1, 3, 8, 130, seed=2)
    out = cauchy_sym_pallas(v, z, w)
    ref = cauchy_sym_naive(v, z, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_s4_kernel_with_pallas_matches_xla():
    from diffwave_sashimi_tpu.models.s4 import SSKernelNPLR
    H, N, L = 4, 8, 96
    mod_x = SSKernelNPLR(H=H, N=N, l_max=L, channels=2, cauchy="xla")
    mod_p = SSKernelNPLR(H=H, N=N, l_max=L, channels=2, cauchy="pallas")
    params = mod_x.init(jax.random.PRNGKey(0), L)
    k_x = mod_x.apply(params, L)
    k_p = mod_p.apply(params, L)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_x),
                               atol=1e-4, rtol=1e-3)
