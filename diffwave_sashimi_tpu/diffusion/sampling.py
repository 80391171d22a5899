"""Reverse-diffusion sampling compiled to a single on-device ``lax.scan``.

Semantics match the reference T-step Python loop (reference: generate.py:23-55):

    for t = T-1 .. 0:
        eps = net((x, t), mel)
        x = (x - (1 - alpha_t) / sqrt(1 - abar_t) * eps) / sqrt(alpha_t)
        if t > 0: x += sigma_t * N(0, I)

but the whole loop is one compiled scan: no per-step host round trips, no
re-upload of x, and — crucially for S4 backbones — any step-independent
precomputation (the S4 convolution kernels, which depend only on parameters,
not on t or x) is hoisted out of the loop by the caller via ``precomputed``.
The reference recomputes the S4 kernels inside every one of the T network
forwards (reference: models/s4.py:674 called from sashimi.py:158 each step).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule


def sampling(apply_fn: Callable,
             params,
             shape: Tuple[int, ...],
             schedule: DiffusionSchedule,
             rng: jax.Array,
             condition: Optional[jnp.ndarray] = None,
             dtype=jnp.float32) -> jnp.ndarray:
    """Draw samples from the learned reverse process.

    Args:
      apply_fn: ``apply_fn(params, x, t, mel_spec)`` -> eps; t is (B,).
      shape: (B, 1, L) output shape.
      rng: PRNG key; split into the T+1 gaussian draws.

    Returns:
      (B, 1, L) generated audio.
    """
    B = shape[0]
    init_rng, scan_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, shape, dtype=dtype)

    alpha = schedule.alpha.astype(dtype)
    alpha_bar = schedule.alpha_bar.astype(dtype)
    sigma = schedule.sigma.astype(dtype)

    def step(carry, t):
        x, key = carry
        key, noise_key = jax.random.split(key)
        t_batch = jnp.full((B,), t, dtype=jnp.int32)
        eps = apply_fn(params, x, t_batch, condition).astype(dtype)
        a_t = alpha[t]
        abar_t = alpha_bar[t]
        x = (x - (1.0 - a_t) / jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(a_t)
        noise = jax.random.normal(noise_key, shape, dtype=dtype)
        x = jnp.where(t > 0, x + sigma[t] * noise, x)
        return (x, key), None

    ts = jnp.arange(schedule.T - 1, -1, -1, dtype=jnp.int32)
    (x_0, _), _ = jax.lax.scan(step, (x_T, scan_rng), ts)
    return x_0
