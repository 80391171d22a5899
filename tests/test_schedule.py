"""Diffusion schedule golden tests against the reference formulas.

Oracle: re-derivation of utils.py:121-151 in float64 numpy plus literal golden
values, and a direct cross-check against the reference torch implementation.
"""

import numpy as np
import pytest

from diffwave_sashimi_tpu.diffusion import diffusion_schedule, schedule_from_cfg


def test_linear_schedule_basic():
    s = diffusion_schedule(T=200, beta_0=0.0001, beta_T=0.02)
    assert s.T == 200
    np.testing.assert_allclose(float(s.beta[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s.beta[-1]), 0.02, rtol=1e-6)
    # alpha = 1 - beta
    np.testing.assert_allclose(np.asarray(s.alpha), 1 - np.asarray(s.beta),
                               rtol=1e-6)
    # alpha_bar is the cumulative product
    np.testing.assert_allclose(np.asarray(s.alpha_bar),
                               np.cumprod(1 - np.linspace(1e-4, 0.02, 200)),
                               rtol=1e-5)
    # sigma_0 = sqrt(beta_0); sigma_t = sqrt(beta_t (1-abar_{t-1})/(1-abar_t))
    abar = np.cumprod(1 - np.linspace(1e-4, 0.02, 200))
    b = np.linspace(1e-4, 0.02, 200)
    bt = b.copy()
    bt[1:] = b[1:] * (1 - abar[:-1]) / (1 - abar[1:])
    np.testing.assert_allclose(np.asarray(s.sigma), np.sqrt(bt), rtol=1e-5)


def test_fast_beta_override():
    # fast=True with an explicit beta list overrides T (ref utils.py:133-135)
    s = diffusion_schedule(T=200, beta_0=0.0001, beta_T=0.02,
                           beta=[0.0001, 0.001, 0.01, 0.05], fast=True)
    assert s.T == 4
    np.testing.assert_allclose(np.asarray(s.beta),
                               [0.0001, 0.001, 0.01, 0.05], rtol=1e-6)
    # fast=False ignores the explicit list
    s2 = diffusion_schedule(T=200, beta_0=0.0001, beta_T=0.02,
                            beta=[0.1, 0.2], fast=False)
    assert s2.T == 200


def test_against_torch_reference(torch_ref):
    torch = torch_ref.torch
    T, b0, bT = 50, 1e-4, 0.05
    Beta = torch.linspace(b0, bT, T)
    Alpha = 1 - Beta
    Alpha_bar = Alpha + 0
    Beta_tilde = Beta + 0
    for t in range(1, T):
        Alpha_bar[t] *= Alpha_bar[t - 1]
        Beta_tilde[t] *= (1 - Alpha_bar[t - 1]) / (1 - Alpha_bar[t])
    Sigma = torch.sqrt(Beta_tilde)

    s = diffusion_schedule(T=T, beta_0=b0, beta_T=bT)
    np.testing.assert_allclose(np.asarray(s.alpha_bar), Alpha_bar.numpy(),
                               rtol=2e-5)
    # t=1 has mild f32 cancellation in the reference; our f64 path is tighter
    np.testing.assert_allclose(np.asarray(s.sigma), Sigma.numpy(), rtol=2e-4)


def test_schedule_from_cfg():
    cfg = {"T": 200, "beta_0": 1e-4, "beta_T": 0.02, "beta": None}
    s = schedule_from_cfg(cfg)
    assert s.T == 200
