"""Sinusoidal diffusion-step embedding.

Parity with the reference ``calc_diffusion_step_embedding``
(reference: models/utils.py:4-29): geometric frequencies
``exp(-log(10000) * i / (half_dim - 1))`` for i in [0, half_dim), embedding is
``[sin(t * f_i) ; cos(t * f_i)]``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def diffusion_step_embedding(diffusion_steps: jnp.ndarray,
                             dim_in: int = 128,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Embed integer diffusion steps.

    Args:
      diffusion_steps: (B,) or (B, 1) array of step indices (any numeric dtype).
      dim_in: embedding dimensionality (must be even; default 128).

    Returns:
      (B, dim_in) embedding.
    """
    assert dim_in % 2 == 0, "embedding dim must be even"
    half = dim_in // 2
    steps = jnp.asarray(diffusion_steps, dtype=dtype).reshape(-1, 1)  # (B, 1)
    freqs = jnp.exp(
        jnp.arange(half, dtype=dtype) * (-math.log(10000.0) / (half - 1))
    )  # (half,)
    args = steps * freqs  # (B, half)
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
