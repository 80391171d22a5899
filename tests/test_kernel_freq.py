"""Frequency-domain kernel hoisting must be output-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from diffwave_sashimi_tpu.models.s4 import S4
from diffwave_sashimi_tpu.models.sashimi import Sashimi


def test_s4_freq_kernel_identical():
    H, N, L = 4, 8, 96
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=True)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, H, L)))
    u = jax.random.normal(jax.random.PRNGKey(1), (2, H, L))
    y0 = jax.jit(mod.apply)(params, u)
    kf = jax.jit(lambda p: mod.apply(
        p, L, method=S4.compute_kernel_freq))(params)
    assert jnp.iscomplexobj(kf)
    y1 = jax.jit(lambda p, u, k: mod.apply(p, u, kernel=k))(params, u, kf)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_sashimi_freq_kernels_identical():
    L = 256
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=L)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L)),
                                 jnp.zeros((1,), jnp.int32))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 1, L))
    steps = jnp.array([5, 6])
    y0 = jax.jit(model.apply)(params, audio, steps)
    kf = jax.jit(lambda p: model.apply(
        p, L, True, method=Sashimi.compute_kernels))(params)
    y1 = jax.jit(model.apply)(params, audio, steps, None, kf)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_sashimi_fact_kernels_identical():
    """Fused factorized-kernel conv path == plain path (interpret mode)."""
    L = 256
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=L)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L)),
                                 jnp.zeros((1,), jnp.int32))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 1, L))
    steps = jnp.array([5, 6])
    y0 = jax.jit(model.apply)(params, audio, steps)
    kfact = jax.jit(lambda p: model.apply(
        p, L, "fact", method=Sashimi.compute_kernels))(params)
    for v in kfact.values():
        assert v.ndim == 5 and v.shape[1] == 2  # (n_layers, 2, H, N1, K2)
    y1 = jax.jit(model.apply)(params, audio, steps, None, kfact)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)
