"""The single-scan sampler (diffusion.sampling.sampling): previously only
the pipelined host-loop form was exercised (the TPU path must use it —
backend watchdog).  Pin the scan form against an explicit Python loop with
identical key threading, and against the pipelined form where their key
schedules coincide."""

import numpy as np

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.diffusion import (diffusion_schedule, sampling,
                                            sampling_pipelined)

SHAPE = (2, 1, 64)


def _toy_apply(params, x, t, mel):
    # eps depends on x and t so the step arithmetic is non-trivial
    return 0.1 * x + 0.01 * t[:, None, None].astype(jnp.float32)


def test_scan_sampler_matches_python_loop():
    schedule = diffusion_schedule(T=5, beta_0=1e-4, beta_T=0.05)
    rng = jax.random.PRNGKey(3)
    out = sampling(_toy_apply, None, SHAPE, schedule, rng)

    # explicit loop with the scan's exact key threading
    init_rng, key = jax.random.split(rng)
    x = jax.random.normal(init_rng, SHAPE, jnp.float32)
    for t in range(schedule.T - 1, -1, -1):
        key, nk = jax.random.split(key)
        tb = jnp.full((SHAPE[0],), t, jnp.int32)
        eps = _toy_apply(None, x, tb, None)
        x = (x - (1 - schedule.alpha[t]) /
             jnp.sqrt(1 - schedule.alpha_bar[t]) * eps) \
            / jnp.sqrt(schedule.alpha[t])
        if t > 0:
            x = x + schedule.sigma[t] * jax.random.normal(nk, SHAPE,
                                                          jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=1e-5, rtol=1e-5)


def test_scan_sampler_matches_pipelined_at_t1():
    """At T=1 no noise is drawn (t=0 skips it), so the two samplers' key
    schedules coincide and the outputs must be bitwise-close."""
    schedule = diffusion_schedule(T=1, beta_0=1e-4, beta_T=0.05)
    rng = jax.random.PRNGKey(4)
    a = sampling(_toy_apply, None, SHAPE, schedule, rng)
    b = sampling_pipelined(_toy_apply, None, SHAPE, schedule, rng,
                           sync_every=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)
