"""Symmetric Cauchy-sum kernels: the S4/NPLR resolvent evaluation.

Computes, for conjugate-pair parameterization (half states stored),

    r[..., l] = sum_n  v[..., n] / (z[l] - w[..., n])
              + conj(v[..., n]) / (z[l] - conj(w[..., n]))

the quantity the reference evaluates with its CUDA extension
(``cauchy_mult(v, z, w, symmetric=True)``, extensions/cauchy/cauchy.py:46-63;
kernels in extensions/cauchy/cauchy_cuda.cu).  NOTE: the reference's vendored
pure-torch fallback ``cauchy_naive`` (models/s4.py:109-116) is missing the
conjugate half present in the upstream state-spaces repo; we implement the
correct (CUDA-kernel) semantics.

TPU-first formulation: combining each conjugate pair gives an all-REAL
rational function of complex z,

    r(z) = sum_n (a_n z + b_n) / (z^2 + c_n z + d_n)

with a = 2 Re(v), b = -2 Re(v conj(w)), c = -2 Re(w), d = |w|^2.  Splitting
out z, the sum over n becomes two small batched matmuls:

    r[..., l] = sum_n a_n * G1[n, l] + b_n * G0[n, l],
    G0 = 1 / (z^2 + c z + d),  G1 = z * G0

which the MXU executes directly (contraction over the N=d_state/2 axis).  The
G tensors are built in L-chunks so peak memory stays bounded; XLA autodiff
provides the backward pass.  A fused Pallas kernel for the same contraction
lives in ``cauchy_pallas.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def cauchy_sym_naive(v: jnp.ndarray, z: jnp.ndarray, w: jnp.ndarray
                     ) -> jnp.ndarray:
    """Direct O(N*L) complex broadcast — oracle for tests.

    v: (..., H, N) complex; w: (H, N) or (..., H, N) complex; z: (L,) complex.
    Returns (..., H, L) complex.
    """
    vv = jnp.concatenate([v, jnp.conj(v)], axis=-1)[..., None]   # (..., 2N, 1)
    ww = jnp.concatenate([w, jnp.conj(w)], axis=-1)[..., None]   # (..., 2N, 1)
    return jnp.sum(vv / (z - ww), axis=-2)


@partial(jax.jit, static_argnames=("chunk",))
def cauchy_sym(v: jnp.ndarray, z: jnp.ndarray, w: jnp.ndarray,
               chunk: int = 8192) -> jnp.ndarray:
    """Symmetric Cauchy sum via the real-coefficient two-matmul form.

    Args:
      v: (A, B, H, N) complex64 (any number >=1 of leading batch dims works).
      z: (L,) complex64 evaluation nodes.
      w: (H, N) complex64 (shared across v's leading dims).
      chunk: L-chunk size bounding the (H, N, chunk) G tensors.

    Returns:
      (A, B, H, L) complex64.
    """
    # Real coefficient tensors.
    a = 2.0 * v.real                                   # (..., H, N)
    b = -2.0 * (v.real * w.real + v.imag * w.imag)     # Re(v conj(w)) * -2
    c = -2.0 * w.real                                  # (H, N)
    d = w.real ** 2 + w.imag ** 2                      # (H, N)

    L = z.shape[0]

    def one_chunk(z_c):
        # z_c: (chunk,) complex
        z2 = z_c * z_c
        denom = z2[None, None, :] + c[..., None] * z_c[None, None, :] \
            + d[..., None]                             # (H, N, chunk) complex
        G0 = 1.0 / denom
        G1 = z_c[None, None, :] * G0
        # Contract over n: (..., H, N) x (H, N, chunk) -> (..., H, chunk).
        # HIGHEST precision: on TPU, default-precision complex einsums run
        # as bf16 MXU matmuls (~2.5e-3 error); this path is the accuracy
        # fallback, so keep it strict f32.
        r = jnp.einsum("...hn,hnl->...hl", a.astype(G1.dtype), G1,
                       precision=jax.lax.Precision.HIGHEST) \
            + jnp.einsum("...hn,hnl->...hl", b.astype(G0.dtype), G0,
                         precision=jax.lax.Precision.HIGHEST)
        return r

    if L <= chunk:
        return one_chunk(z)                            # single shot, no map
    pad = (-L) % chunk
    z_p = jnp.pad(z, (0, pad), constant_values=1.0)
    z_chunks = z_p.reshape(-1, chunk)                  # (nc, chunk)
    out = jax.lax.map(one_chunk, z_chunks)             # (nc, ..., H, chunk)
    out = jnp.moveaxis(out, 0, -2)                     # (..., H, nc, chunk)
    out = out.reshape(out.shape[:-2] + (-1,))          # (..., H, nc*chunk)
    return out[..., :L]
