"""Aligned fast sampling (round 5).

The reference's fast path feeds raw step indices 0..S-1 to a model
trained on the full T-step embedding scale (ref utils.py:50 +
utils.py:133-135) — measured at noise-level quality on the flagship
(eval_assets/flagship_fid.json: FID 45.8 vs the 45.96 noise bracket).
The DiffWave paper's algorithm (Appendix B) instead feeds the
fractional full-schedule step with the same sqrt(alpha_bar).  These
tests pin the mapping and the sampler wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from diffwave_sashimi_tpu.diffusion import (diffusion_schedule, sampling,
                                            sampling_pipelined)
from diffwave_sashimi_tpu.diffusion.schedule import align_fast_steps

FAST6 = [0.0001, 0.001, 0.01, 0.05, 0.2, 0.5]


def test_align_fast_steps_mapping():
    t = align_fast_steps(np.cumprod(1 - np.asarray(FAST6)), 200, 1e-4, 0.02)
    assert t.shape == (6,)
    # more noise (later fast step) -> later trained step, strictly
    assert np.all(np.diff(t) > 0)
    assert 0.0 <= t[0] < 1.0          # beta_0 matches trained step 0
    assert t[-1] <= 199.0
    # exact alpha-bar round-trip at every non-clamped point
    b = np.linspace(1e-4, 0.02, 200)
    st = np.sqrt(np.cumprod(1 - b))
    sf = np.sqrt(np.cumprod(1 - np.asarray(FAST6)))
    for s in range(6):
        lo, hi = int(np.floor(t[s])), int(np.ceil(t[s]))
        frac = t[s] - lo
        got = st[lo] + (st[hi] - st[lo]) * frac
        np.testing.assert_allclose(got, sf[s], rtol=1e-9)


def test_schedule_carries_t_embed_only_when_fast():
    s = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    assert s.t_embed is None
    sf = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02, beta=FAST6,
                            fast=True)
    assert sf.t_embed is not None and sf.t_embed.shape == (6,)
    sref = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02, beta=FAST6,
                              fast=True, align=False)
    assert sref.t_embed is None       # reference behavior still available


def test_sampler_feeds_aligned_steps():
    """Both sampler variants must feed t_embed[t] (not t) to the model;
    verified by an apply_fn whose eps IS the step value it received."""
    sf = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02, beta=FAST6,
                            fast=True)
    shape = (1, 1, 8)
    rng = jax.random.PRNGKey(0)

    def apply_fn(params, x, t, mel=None):
        return jnp.zeros(shape) + t.astype(jnp.float32)[:, None, None]

    out_scan = sampling(apply_fn, None, shape, sf, rng)
    assert np.isfinite(np.asarray(out_scan)).all()
    out_pipe = sampling_pipelined(apply_fn, None, shape, sf, rng,
                                  sync_every=0)

    # hand-rolled reverse process with eps_t = t_embed[t]
    a = np.asarray(sf.alpha, np.float64)
    ab = np.asarray(sf.alpha_bar, np.float64)
    sg = np.asarray(sf.sigma, np.float64)
    te = np.asarray(sf.t_embed, np.float64)
    init, loop = jax.random.split(rng)
    x = np.asarray(jax.random.normal(init, shape), np.float64)
    keys = jax.random.split(jax.random.split(rng)[1], sf.T)
    for t in range(sf.T - 1, -1, -1):
        x = (x - (1 - a[t]) / np.sqrt(1 - ab[t]) * te[t]) / np.sqrt(a[t])
        if t > 0:
            x = x + sg[t] * np.asarray(
                jax.random.normal(keys[t], shape), np.float64)
    np.testing.assert_allclose(np.asarray(out_pipe)[0], x[0], rtol=1e-4,
                               atol=1e-4)
