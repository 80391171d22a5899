"""Denoising score-matching training loss.

Parity with the reference ``training_loss`` (reference: train.py:198-222):
uniform random step t per batch element, forward q-sample
``x_t = sqrt(abar_t) x_0 + sqrt(1 - abar_t) z``, MSE between the predicted and
true noise.  PRNG is threaded explicitly instead of torch global state.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule


def training_loss(apply_fn: Callable,
                  params,
                  audio: jnp.ndarray,
                  schedule: DiffusionSchedule,
                  rng: jax.Array,
                  mel_spec: Optional[jnp.ndarray] = None,
                  model_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Compute the eps-prediction MSE loss.

    Args:
      apply_fn: ``apply_fn(params, x_t, t, mel_spec, rngs=...)`` -> eps_theta,
        with x_t shaped (B, 1, L) and t shaped (B,).
      audio: clean waveforms (B, 1, L).
      rng: PRNG key for (t, z) sampling.
      model_rng: optional PRNG key for stochastic model components (dropout).
    """
    B = audio.shape[0]
    t_rng, z_rng = jax.random.split(rng)
    t = jax.random.randint(t_rng, (B,), 0, schedule.T)
    z = jax.random.normal(z_rng, audio.shape, dtype=audio.dtype)

    abar_t = schedule.alpha_bar[t].reshape(B, 1, 1).astype(audio.dtype)
    x_t = jnp.sqrt(abar_t) * audio + jnp.sqrt(1.0 - abar_t) * z

    kwargs = {}
    if model_rng is not None:
        kwargs["rngs"] = {"dropout": model_rng}
    eps_theta = apply_fn(params, x_t, t, mel_spec, **kwargs)
    return jnp.mean((eps_theta.astype(jnp.float32) - z.astype(jnp.float32)) ** 2)
