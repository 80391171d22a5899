"""Log-Vandermonde contraction for the diagonal (S4D) kernel.

    K[..., l] = 2 * Re( sum_n v[..., n] * exp(x[..., n] * l) )

Parity with the reference ``log_vandermonde`` fallback (models/s4.py:121-131),
which is what its shipped configs use for S4D mode.  Chunked over L so the
(..., N, chunk) intermediate stays small; the contraction over N is a batched
matmul on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def log_vandermonde_naive(v: jnp.ndarray, x: jnp.ndarray, L: int) -> jnp.ndarray:
    """Oracle: materialize the full (..., N, L) Vandermonde matrix."""
    l = jnp.arange(L, dtype=jnp.float32)
    V = jnp.exp(x[..., None] * l)          # (..., N, L)
    return 2.0 * jnp.einsum("...n,...nl->...l", v, V).real


@partial(jax.jit, static_argnames=("L", "chunk"))
def log_vandermonde(v: jnp.ndarray, x: jnp.ndarray, L: int,
                    chunk: int = 4096) -> jnp.ndarray:
    """v, x: (..., N) complex64 -> (..., L) real f32."""
    n_chunks = -(-L // chunk)

    def one_chunk(start):
        l = start + jnp.arange(chunk, dtype=jnp.float32)
        V = jnp.exp(x[..., None] * l)      # (..., N, chunk)
        return 2.0 * jnp.einsum("...n,...nl->...l", v, V).real

    starts = (jnp.arange(n_chunks) * chunk).astype(jnp.float32)
    out = jax.lax.map(one_chunk, starts)   # (nc, ..., chunk)
    out = jnp.moveaxis(out, 0, -2).reshape(v.shape[:-1] + (-1,))
    return out[..., :L]
