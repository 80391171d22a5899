"""NPLR state-space discretization utilities (pure functions, complex64).

Functional equivalents of the stateful machinery in the reference
``SSKernelNPLR`` (models/s4.py:520-1001):

- :func:`discretize`      — bilinear-discretized (dA, dB) from the DPLR
                            parameters via the O(N) linear-step trick
                            (ref ``_setup_linear``/``_step_state_linear``/
                            ``_setup_state``, models/s4.py:824-906).
- :func:`matrix_power`    — A^L by repeated squaring (ref ``power``,
                            models/s4.py:206-246).
- :func:`setup_C`         — one-time train-length truncation transform
                            C~ = (I - dA^L)^* C (ref ``_setup_C``,
                            models/s4.py:524-551), applied at parameter init.
- :func:`extend_C`        — functional kernel-length doubling
                            C~_{2L} = C~_L (I + (dA^L)^*) for generating
                            sequences longer than the training length, done
                            on the fly instead of mutating a buffer.

All of these run rarely (init / once per generation length), so clarity wins
over micro-optimization; complex64 matches the reference's f32 GPU numerics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# All contractions in this module run at HIGHEST precision: they execute
# once at init / kernel setup, and the repeated-squaring chains (dA^L via
# ~14 squarings at L=16000) amplify bf16 MXU rounding exponentially — a
# DEFAULT-precision dA^L made on-TPU C~ inits untrainable garbage while
# CPU inits were fine (found via same-seed loss-trajectory bisection).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _conj(x: jnp.ndarray) -> jnp.ndarray:
    """Append the conjugate half: (..., N) -> (..., 2N)."""
    return jnp.concatenate([x, jnp.conj(x)], axis=-1)


def discretize(w: jnp.ndarray, P: jnp.ndarray, B: jnp.ndarray,
               dt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear-discretize the DPLR system A = diag(w) - P Q^* (Q = conj(P)).

    Args:
      w: (H, N) complex — diagonal part (half the conjugate pairs).
      P: (R, H, N) complex — low-rank part.
      B: (H, N) complex.
      dt: (H,) real timescales.

    Returns:
      dA: (H, 2N, 2N) complex, dB: (H, 2N) complex (conjugate-expanded).
    """
    R_rank = P.shape[0]
    Q = jnp.conj(P)

    D = 1.0 / (2.0 / dt[:, None] - w)                       # (H, N)
    E = 2.0 / dt[:, None] + w                               # (H, N)
    # R = (I_r + 2 Re(Q D P^T))^{-1} Q D  (ref models/s4.py:833-841)
    R_mat = jnp.eye(R_rank, dtype=w.dtype) \
        + 2.0 * jnp.einsum("rhn,hn,shn->hrs", Q, D, P, precision=_HI).real.astype(w.dtype)
    QD = jnp.einsum("rhn,hn->hrn", Q, D, precision=_HI)                    # (H, R, N)
    if R_rank == 1:
        # scalar 'solve' — avoids complex linalg, which TPU doesn't lower
        Rs = QD / R_mat[..., :1]                            # (H, 1, N)
    else:
        Rs = jnp.linalg.solve(R_mat, QD)                    # (H, R, N)
    Rs = jnp.moveaxis(Rs, 0, 1)                             # (R, H, N)

    # Conjugate-expanded operators for stepping full 2N-dim states.
    Pc, Qc, Rc = _conj(P), _conj(Q), _conj(Rs)
    Dc, Ec, Bc = _conj(D), _conj(E), _conj(B)

    def linear_step(state: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        # state: (..., H, 2N); u: (H,)
        ns = Ec * state - jnp.einsum("rhn,rhm,...hm->...hn", Pc, Qc, state, precision=_HI)
        ns = ns + 2.0 * Bc * u[:, None]
        return Dc * (ns - jnp.einsum("rhn,rhm,...hm->...hn", Pc, Rc, ns, precision=_HI))

    H, N = w.shape
    twoN = 2 * N
    eye = jnp.eye(twoN, dtype=w.dtype)[:, None, :]          # (2N, 1, 2N)
    zeros_u = jnp.zeros((H,), dtype=w.dtype)
    dA = linear_step(eye, zeros_u)                          # (2N, H, 2N)
    dA = jnp.transpose(dA, (1, 2, 0))                       # (H, m, n)

    dB = linear_step(jnp.zeros((1, H, twoN), dtype=w.dtype),
                     jnp.ones((H,), dtype=w.dtype))[0]      # (H, 2N)
    return dA, dB


def matrix_power(L: int, A: jnp.ndarray) -> jnp.ndarray:
    """A^L for (..., N, N) by binary exponentiation (static L)."""
    out = jnp.broadcast_to(
        jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    base = A
    l = L
    while l > 0:
        if l % 2 == 1:
            out = _mm(base, out)
        l //= 2
        if l > 0:
            base = _mm(base, base)
    return out


def power_contract(L: int, A: jnp.ndarray, v: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (A^L, sum_i A^i v[..., i]) by reverse divide-and-conquer.

    Mirrors the reference ``power`` (models/s4.py:206-246): O(log L) matrix
    squarings plus O(L) batched matvecs in log depth — the building block of
    ``forward_state`` (state forwarding through a length-L chunk).

    A: (..., N, N); v: (..., N, L).  Static L.
    """
    I = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    powers = [A]
    l_rem, l = L, 1
    while True:
        if l_rem % 2 == 1:
            I = _mm(powers[-1], I)
        l_rem //= 2
        if l_rem == 0:
            break
        l *= 2
        powers.append(_mm(powers[-1], powers[-1]))

    # fold the non-power-of-two tail: v[..., l:] gets an extra A^l
    k = v.shape[-1] - l
    if k > 0:
        v_tail = jnp.einsum("...mn,...nl->...ml", powers[-1], v[..., l:], precision=_HI)
        v = v[..., :l]
        v = v.at[..., :k].add(v_tail)
    powers.pop()
    while v.shape[-1] > 1:
        half = v.shape[-1] // 2
        v = v.reshape(v.shape[:-1] + (2, half))
        v = v[..., 0, :] + jnp.einsum("...mn,...nl->...ml",
                                      powers.pop(), v[..., 1, :],
                                      precision=_HI)
    return I, v[..., 0]


def setup_C(C: jnp.ndarray, dA: jnp.ndarray, L: int) -> jnp.ndarray:
    """Train-length truncation: C~ = C - (dA^L)^T-applied C (half-stored).

    C: (channels, H, N) complex (half pairs).  Returns the same shape.
    """
    dA_L = matrix_power(L, dA)                              # (H, 2N, 2N)
    C_full = _conj(C)                                       # (c, H, 2N)
    prod = jnp.einsum("hmn,chn->chm",
                      jnp.swapaxes(dA_L, -1, -2), C_full, precision=_HI)
    C_new = C_full - prod
    return C_new[..., : C.shape[-1]]


def extend_C(C_tilde: jnp.ndarray, dA: jnp.ndarray, L_cur: int,
             L_target: int) -> Tuple[jnp.ndarray, int]:
    """Double the kernel length until >= L_target (ref doubling mode).

    C~_{2L} = C~_L + (dA^L)^T C~_L  (the ``double_length`` branch of
    ref ``_setup_C`` flips the sign of the correction, models/s4.py:546).
    """
    while L_target > L_cur:
        dA_L = matrix_power(L_cur, dA)
        C_full = _conj(C_tilde)
        prod = jnp.einsum("hmn,chn->chm",
                          jnp.swapaxes(dA_L, -1, -2), C_full,
                          precision=_HI)
        C_full = C_full + prod
        C_tilde = C_full[..., : C_tilde.shape[-1]]
        L_cur *= 2
    return C_tilde, L_cur
