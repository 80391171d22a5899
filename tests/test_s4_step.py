"""Recurrence-vs-convolution cross-check for the S4 stepping mode.

The strongest available oracle: a unidirectional S4's convolutional forward
and its dense recurrence must produce identical outputs on the same input
(the discretizations agree by construction).  This validates the whole
bilinear-discretization chain (discretize, C~ inversion) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffwave_sashimi_tpu.models.s4 import S4
from diffwave_sashimi_tpu.models.s4_step import (default_state,
                                                 nplr_step_setup, s4_step)


def test_step_matches_convolution():
    H, N, L, B = 4, 8, 64, 2
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=False)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, H, L)))

    u = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, H, L)),
                   np.float32)
    y_conv = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(u)))

    sp = nplr_step_setup(params["params"], l_max=L)
    state = default_state(B, H, N)
    step = jax.jit(s4_step)
    ys = []
    for t in range(L):
        y_t, state = step(sp, jnp.asarray(u[:, :, t]), state)
        ys.append(np.asarray(y_t))
    y_rec = np.stack(ys, axis=-1)                           # (B, H, L)

    np.testing.assert_allclose(y_rec, y_conv, atol=2e-3, rtol=1e-2)


def test_state_spectrum_is_stable():
    # all |eig(dA)| <= 1: the discretized system must be stable
    H, N, L = 3, 8, 32
    mod = S4(d_model=H, d_state=N, l_max=L, bidirectional=False)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, H, L)))
    sp = nplr_step_setup(params["params"], l_max=L)
    eigs = np.linalg.eigvals(np.asarray(sp.dA))
    assert np.abs(eigs).max() <= 1.0 + 1e-4
