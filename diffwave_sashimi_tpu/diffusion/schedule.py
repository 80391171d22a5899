"""DDPM diffusion schedule as a frozen PyTree of JAX arrays.

Numerical parity with the reference ``calc_diffusion_hyperparams``
(reference: utils.py:121-151): linear beta schedule, cumulative-product
alpha-bar, and ``Sigma = sqrt(beta_tilde)`` with
``beta_tilde_t = beta_t * (1 - abar_{t-1}) / (1 - abar_t)`` (``beta_tilde_0 =
beta_0``).  The ``fast``/``beta`` override replaces the linear schedule with an
explicit beta list for few-step inference (reference: utils.py:133-135).

Unlike the reference dict of CUDA tensors, this is a NamedTuple of device
arrays that jit/scan close over directly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    T: int                 # number of diffusion steps (static)
    beta: jnp.ndarray      # (T,) noise variances
    alpha: jnp.ndarray     # (T,) 1 - beta
    alpha_bar: jnp.ndarray  # (T,) cumprod of alpha
    sigma: jnp.ndarray     # (T,) reverse-process noise scale sqrt(beta_tilde)
    # (T,) float step values fed to the model's step embedding, or None to
    # feed the integer step index (the reference's behavior).  Set by the
    # ``align`` fast path: the model was trained on the FULL schedule's
    # step<->noise-level correspondence, so few-step inference must map
    # each fast step to the full-schedule step with the same sqrt(abar)
    # (DiffWave paper Appendix B).  The reference omits this and feeds raw
    # 0..5 (utils.py:50), which we measured at noise-level quality
    # (FID 45.8 vs noise 45.96, eval_assets/flagship_fid.json round 5).
    t_embed: Optional[jnp.ndarray] = None


# DiffWave's published 6-entry fast variance schedule (reference
# utils.py:133-135) — also the SHAPE template for other step counts.
FAST_BETA_6 = (0.0001, 0.001, 0.01, 0.05, 0.2, 0.5)


def fast_beta_list(T: int, shape: str = "canon"):
    """A T-entry fast variance schedule over the canonical endpoints.

    ``canon`` (default) resamples the canonical 6-entry list's shape
    (log-linear interpolation in index space — steep early, slowing
    tail); ``geom`` is pure log-spacing.  Measured on the d128 flagship
    (BASELINE.md round-5): canon T=12 scores FID 1.24 vs the exact
    T=200 path's 1.31 at ~22.5x realtime — schedule shape matters
    (canon dominates geom at matched T).  T=6 returns the canonical
    list itself for both shapes.
    """
    if T == 6:
        return [float(b) for b in FAST_BETA_6]
    if shape == "canon":
        xs = np.linspace(0.0, len(FAST_BETA_6) - 1, T)
        return [float(b) for b in
                np.exp(np.interp(xs, np.arange(len(FAST_BETA_6)),
                                 np.log(FAST_BETA_6)))]
    if shape == "geom":
        return [float(b) for b in
                np.geomspace(FAST_BETA_6[0], FAST_BETA_6[-1], T)]
    raise ValueError(f"unknown fast schedule shape {shape!r} "
                     "(expected 'canon' or 'geom')")


def align_fast_steps(abar_fast: np.ndarray, T: int, beta_0: float,
                     beta_T: float) -> np.ndarray:
    """Map fast-schedule noise levels onto the trained schedule's steps.

    Returns (len(abar_fast),) float64: for each fast step s, the (linearly
    interpolated, possibly fractional) t in [0, T-1] whose training
    sqrt(alpha_bar) equals sqrt(abar_fast[s]).  Endpoints clamp.
    """
    b = np.linspace(beta_0, beta_T, T, dtype=np.float64)
    st = np.sqrt(np.cumprod(1.0 - b))          # decreasing in t
    sf = np.sqrt(np.asarray(abar_fast, dtype=np.float64))
    # np.interp needs increasing xp: reverse both axes
    return np.interp(sf, st[::-1], np.arange(T, dtype=np.float64)[::-1])


def diffusion_schedule(T: int, beta_0: float, beta_T: float,
                       beta: Optional[Sequence[float]] = None,
                       fast: bool = False, align: bool = True,
                       dtype=jnp.float32) -> DiffusionSchedule:
    """Build the schedule. Computed in float64 numpy, stored at ``dtype``.

    The reference computes in float32 torch; we use f64 intermediates (the
    cumulative product over 200 terms is the only place it matters) and cast
    once, which agrees with the reference to f32 roundoff.

    ``align`` (fast path only): feed the model alpha-bar-matched fractional
    steps of the trained (T, beta_0, beta_T) schedule instead of the raw
    fast indices — see :class:`DiffusionSchedule`.  ``align=False``
    reproduces the reference's (measured quality-broken) behavior.
    """
    t_embed = None
    if fast and beta is not None:
        b = np.asarray(beta, dtype=np.float64)
        if align:
            abar_f = np.cumprod(1.0 - b)
            t_embed = jnp.asarray(align_fast_steps(abar_f, T, beta_0,
                                                   beta_T), dtype=dtype)
        T = len(b)
    else:
        b = np.linspace(beta_0, beta_T, T, dtype=np.float64)

    a = 1.0 - b
    abar = np.cumprod(a)
    beta_tilde = b.copy()
    # beta_tilde_t = beta_t * (1 - abar_{t-1}) / (1 - abar_t); t=0 keeps beta_0.
    beta_tilde[1:] = b[1:] * (1.0 - abar[:-1]) / (1.0 - abar[1:])
    sigma = np.sqrt(beta_tilde)

    return DiffusionSchedule(
        T=int(T),
        beta=jnp.asarray(b, dtype=dtype),
        alpha=jnp.asarray(a, dtype=dtype),
        alpha_bar=jnp.asarray(abar, dtype=dtype),
        sigma=jnp.asarray(sigma, dtype=dtype),
        t_embed=t_embed,
    )


def schedule_from_cfg(diffusion_cfg, fast: bool = False) -> DiffusionSchedule:
    """Build from a ``diffusion:`` config block (keys T, beta_0, beta_T,
    beta, and optionally align / fast_steps / fast_shape).

    ``fast_steps`` (int) synthesizes a T-entry fast schedule via
    :func:`fast_beta_list` when no explicit ``beta`` list is given —
    e.g. ``generate.py experiment=sc09 +diffusion.fast_steps=12`` runs
    the measured quality-parity ~22.5x operating point.  ``fast_shape``
    picks the list shape (default ``canon``)."""
    beta = diffusion_cfg.get("beta")
    if fast and beta is None and diffusion_cfg.get("fast_steps"):
        beta = fast_beta_list(int(diffusion_cfg["fast_steps"]),
                              str(diffusion_cfg.get("fast_shape", "canon")))
    return diffusion_schedule(
        T=int(diffusion_cfg["T"]),
        beta_0=float(diffusion_cfg["beta_0"]),
        beta_T=float(diffusion_cfg["beta_T"]),
        beta=beta,
        fast=fast,
        align=bool(diffusion_cfg.get("align", True)),
    )
