"""HiPPO / NPLR / DPLR state-space initializations.

Init-time-only math, computed in float64 numpy on the host (the reference
does the eigendecomposition in double precision too — models/s4.py:362-366
``diagonalize_precision``) and handed to JAX as complex64.

Derivations follow the S4 papers (Gu et al., "Efficiently Modeling Long
Sequences with Structured State Spaces" and "On the Parameterization and
Initialization of Diagonal State Space Models"); behavioral parity with the
reference factory functions ``transition``/``rank_correction``/``nplr``/
``dplr``/``ssm``/``combination`` (models/s4.py:251-502).

Returned shapes (half the true state size N/2 kept, conjugate pairs implied):
  w: (S, N/2) complex  — diagonal of the normal part
  P: (R, S, N/2) complex — low-rank correction
  B: (S, N/2) complex
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def transition(measure: str, N: int) -> Tuple[np.ndarray, np.ndarray]:
    """(A, B) continuous-time transition for a HiPPO measure, float64."""
    if measure == "legt":
        q = np.arange(N, dtype=np.float64)
        r = np.sqrt(2 * q + 1)
        j, i = np.meshgrid(q, q)
        A = -(r[:, None] * np.where(i < j, (-1.0) ** (i - j), 1.0) * r[None, :])
        B = r[:, None]
        A = A * 0.5
        B = B * 0.5
    elif measure == "legs":
        q = np.arange(N, dtype=np.float64)
        col, row = np.meshgrid(q, q)
        r = 2 * q + 1
        M = -(np.where(row >= col, r, 0) - np.diag(q))
        T = np.sqrt(np.diag(2 * q + 1))
        A = T @ M @ np.linalg.inv(T)
        B = np.diag(T)[:, None].copy()
    elif measure == "legsd":
        A, B = transition("legs", N)
        A = A + 0.5 * B * B[None, :, 0]
        B = B / 2.0
    elif measure in ("fourier_diag", "foud"):
        freqs = np.arange(N // 2, dtype=np.float64)
        d = np.stack([freqs, np.zeros(N // 2)], axis=-1).reshape(-1)[:-1]
        A = 2 * np.pi * (-np.diag(d, 1) + np.diag(d, -1))
        A = A - 0.5 * np.eye(N)
        B = np.zeros(N)
        B[0::2] = 2 ** 0.5
        B[0] = 1
        B = B[:, None]
    elif measure in ("fourier", "fout"):
        freqs = np.arange(N // 2, dtype=np.float64)
        d = np.stack([np.zeros(N // 2), freqs], axis=-1).reshape(-1)[1:]
        A = np.pi * (-np.diag(d, 1) + np.diag(d, -1))
        B = np.zeros(N)
        B[0::2] = 2 ** 0.5
        B[0] = 1
        A = A - B[:, None] * B[None, :]
        B = B[:, None]
    else:
        raise NotImplementedError(f"measure {measure!r}")
    return A, B


def rank_correction(measure: str, N: int, rank: int = 1) -> np.ndarray:
    """Low-rank P such that A + P P^T is (nearly) skew-symmetric + cI."""
    if measure == "legs":
        assert rank >= 1
        P = np.sqrt(0.5 + np.arange(N, dtype=np.float64))[None, :]  # (1, N)
    elif measure == "legt":
        assert rank >= 2
        base = np.sqrt(1 + 2 * np.arange(N, dtype=np.float64))
        P0 = base.copy()
        P0[0::2] = 0.0
        P1 = base.copy()
        P1[1::2] = 0.0
        P = np.stack([P0, P1], axis=0) * (2 ** -0.5)  # (2, N)
    elif measure in ("fourier", "fout"):
        P = np.zeros(N)
        P[0::2] = 2 ** 0.5
        P[0] = 1
        P = P[None, :]
    elif measure in ("fourier_diag", "foud", "legsd"):
        P = np.zeros((1, N), dtype=np.float64)
    else:
        raise NotImplementedError(f"measure {measure!r}")
    d = P.shape[0]
    if rank > d:
        P = np.concatenate([P, np.zeros((rank - d, N))], axis=0)
    return P


def nplr(measure: str, N: int, rank: int = 1
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Diagonalize A + PP^T = V (diag w) V^* ; return (w, P, B, V) halves.

    w: (N/2,), P: (rank, N/2), B: (N/2,) complex128; V: (N, N/2).
    """
    A, B = transition(measure, N)
    B = B[:, 0]
    P = rank_correction(measure, N, rank=rank)
    AP = A + np.einsum("rn,rm->nm", P, P)

    # AP = cI + skew; diagonalize the skew part with a Hermitian eigensolve.
    w_re = np.mean(np.diagonal(AP))
    w_im, V = np.linalg.eigh(AP * -1j)  # AP*-1j is Hermitian
    w = w_re + 1j * w_im

    # Sort by imaginary part and keep one of each conjugate pair.
    idx = np.argsort(w.imag)
    w = w[idx][: N // 2]
    V = V[:, idx][:, : N // 2]

    # Edge case: a zero eigenvalue pair (fourier measure) needs a fixed basis.
    assert np.abs(w[-2]) > 1e-4, "only 1 zero eigenvalue pair supported"
    if np.abs(w[-1]) < 1e-4:
        V[:, -1] = 0.0
        V[0, -1] = 2 ** -0.5
        V[1, -1] = 2 ** -0.5 * 1j

    V_inv = V.conj().T
    B_half = V_inv @ B.astype(np.complex128)
    P_half = np.einsum("ij,rj->ri", V_inv, P.astype(np.complex128))
    return w, P_half, B_half, V


def dplr(scaling: str, N: int, rank: int = 1, H: int = 1,
         real_scale: float = 1.0, imag_scale: float = 1.0,
         rng: np.random.Generator | None = None
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Diagonal (S4D) initializations: (w, P, B) with P == 0 (diagonal)."""
    if rng is None:
        rng = np.random.default_rng(0)
    real_part = real_scale * 0.5 * np.ones((H, N // 2))
    n = np.arange(N // 2, dtype=np.float64)
    if scaling == "random":
        imag_part = rng.standard_normal((H, N // 2))
    elif scaling == "real":
        imag_part = np.zeros((H, N // 2))
        real_part = 1 + np.tile(n, (H, 1))
    elif scaling in ("linear", "lin"):
        imag_part = np.pi * np.tile(n, (H, 1))
    elif scaling in ("inverse", "inv"):
        imag_part = 1 / np.pi * N * (N / (1 + 2 * np.tile(n, (H, 1))) - 1)
    elif scaling in ("inverse2", "inv2"):
        imag_part = 1 / np.pi * N * (N / (1 + np.tile(n, (H, 1))) - 1)
    elif scaling in ("quadratic", "quad"):
        imag_part = 1 / np.pi * (1 + 2 * np.tile(n, (H, 1))) ** 2
    elif scaling in ("legs", "hippo"):
        w0, _, _, _ = nplr("legsd", N)
        imag_part = np.tile(w0.imag, (H, 1))
    else:
        raise NotImplementedError(f"scaling {scaling!r}")
    w = -real_part + 1j * imag_scale * imag_part
    B = np.ones((H, N // 2), dtype=np.complex128)
    P = np.zeros((rank, H, N // 2), dtype=np.complex128)
    return w, P, B


def ssm(measure: str, N: int, R: int, H: int
        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One measure -> H copies of (w (H,N/2), P (R,H,N/2), B (H,N/2))."""
    if measure.startswith("diag"):
        parts = measure.split("-")
        assert parts[0] == "diag" and len(parts) > 1
        return dplr(parts[1], N, rank=R, H=H)
    w, P, B, _ = nplr(measure, N, R)
    w = np.tile(w, (H, 1))
    P = np.tile(P[:, None, :], (1, H, 1))
    B = np.tile(B, (H, 1))
    return w, P, B


_COMBINATIONS = {
    "hippo": ["legs", "fourier"],
    "diag": ["diag-inv", "diag-lin"],
    "all": ["legs", "fourier", "diag-inv", "diag-lin"],
}


def combination(measures, N: int, R: int, S: int
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split S ssm copies evenly across a list of measures."""
    if isinstance(measures, str):
        measures = _COMBINATIONS.get(measures, [measures])
    assert S % len(measures) == 0
    parts = [ssm(m, N, R, S // len(measures)) for m in measures]
    w = np.concatenate([p[0] for p in parts], axis=0)
    P = np.concatenate([p[1] for p in parts], axis=1)
    B = np.concatenate([p[2] for p in parts], axis=0)
    return w, P, B
