"""S4 recurrent (stepping) mode: O(N) per-sample autoregressive inference.

Functional equivalent of the reference's step machinery
(``SSKernelNPLR._setup_step``/``step``/``default_state``, models/s4.py:
911-1001, and ``S4.step``, :1441-1460).  Note the reference's own
``S4.setup_step`` has an undefined-variable bug (models/s4.py:1439-1440) and
the repo never exercises step mode (generation does full-sequence
convolution per diffusion step); it is provided here as a working part of
the S4 layer API with convolution-vs-recurrence cross-checks in tests.

Design: ``setup`` runs ONCE on the host in float64 numpy (it contains linear
solves and matrix powers that are neither hot nor TPU-friendly); ``step`` is
a pure jittable function over the resulting dense (dA, dB, dC) matrices.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StepParams(NamedTuple):
    dA: jnp.ndarray    # (H, 2N, 2N) complex64
    dB: jnp.ndarray    # (H, 2N) complex64
    dC: jnp.ndarray    # (c, H, 2N) complex64
    D: jnp.ndarray     # (c, H) f32
    out_w: jnp.ndarray  # (2H, H) f32 — GLU output conv
    out_b: jnp.ndarray  # (2H,) f32


def _r2c(x: np.ndarray) -> np.ndarray:
    return x[..., 0] + 1j * x[..., 1]


def _conj(x: np.ndarray) -> np.ndarray:
    return np.concatenate([x, x.conj()], axis=-1)


def _discretize_np(w, P, B, dt):
    """float64 numpy mirror of ops.nplr.discretize."""
    R = P.shape[0]
    Q = P.conj()
    D = 1.0 / (2.0 / dt[:, None] - w)
    E = 2.0 / dt[:, None] + w
    R_mat = np.eye(R) + 2.0 * np.einsum("rhn,hn,shn->hrs", Q, D, P).real
    QD = np.einsum("rhn,hn->hrn", Q, D)
    Rs = np.moveaxis(np.linalg.solve(R_mat, QD), 0, 1)

    Pc, Qc, Rc = _conj(P), _conj(Q), _conj(Rs)
    Dc, Ec, Bc = _conj(D), _conj(E), _conj(B)

    def linear_step(state, u):
        ns = Ec * state - np.einsum("rhn,rhm,...hm->...hn", Pc, Qc, state)
        ns = ns + 2.0 * Bc * u[:, None]
        return Dc * (ns - np.einsum("rhn,rhm,...hm->...hn", Pc, Rc, ns))

    H, N = w.shape
    eye = np.broadcast_to(np.eye(2 * N, dtype=complex)[:, None, :],
                          (2 * N, H, 2 * N))
    dA = linear_step(eye, np.zeros((H,), complex))
    dA = np.transpose(dA, (1, 2, 0))
    dB = linear_step(np.zeros((1, H, 2 * N), complex),
                     np.ones((H,), complex))[0]
    return dA, dB


def nplr_step_setup(s4_params: Dict, l_max: int) -> StepParams:
    """Build dense stepping matrices from an S4 param subtree (NPLR mode).

    s4_params: the flax params dict of one S4 layer (keys: kernel, D,
    output_linear).  Host-side, float64; call once per model load.
    """
    kp = s4_params["kernel"]
    log_dt = np.asarray(kp["log_dt"], np.float64)
    w = -np.exp(np.asarray(kp["inv_w_real"], np.float64)) \
        + 1j * np.asarray(kp["w_imag"], np.float64)
    B = _r2c(np.asarray(kp["B"], np.float64))[0]        # (S, N)
    P = _r2c(np.asarray(kp["P"], np.float64))           # (r, S, N)
    C = _r2c(np.asarray(kp["C"], np.float64))           # (c, H, N)
    H = log_dt.shape[0]
    rep = H // w.shape[0]
    w = np.tile(w, (rep, 1))
    B = np.tile(B, (rep, 1))
    P = np.tile(P, (1, rep, 1))
    dt = np.exp(log_dt)

    dA, dB = _discretize_np(w, P, B, dt)                # (H,2N,2N), (H,2N)

    # dC = (I - (dA^L)^T)^{-1} C_conj  (ref _setup_step, models/s4.py:916-929)
    C_full = _conj(C)                                   # (c, H, 2N)
    if l_max and l_max > 0:
        dA_L = np.linalg.matrix_power(dA, l_max)
        # per h: (I - dA_L^T) dC = C_full
        M = np.eye(dA.shape[-1]) - np.swapaxes(dA_L, -1, -2)  # (H, 2N, 2N)
        dC = np.stack([
            np.linalg.solve(M, C_full[c][..., None])[..., 0]
            for c in range(C_full.shape[0])])           # (c, H, 2N)
    else:
        dC = C_full

    out_w = np.asarray(s4_params["output_linear"]["w"], np.float32)
    out_b = np.asarray(s4_params["output_linear"]["b"], np.float32)
    return StepParams(
        dA=jnp.asarray(dA.astype(np.complex64)),
        dB=jnp.asarray(dB.astype(np.complex64)),
        dC=jnp.asarray(dC.astype(np.complex64)),
        D=jnp.asarray(np.asarray(s4_params["D"], np.float32)),
        out_w=jnp.asarray(out_w), out_b=jnp.asarray(out_b))


def default_state(batch: int, H: int, d_state: int) -> jnp.ndarray:
    """Zero state (B, H, d_state) complex64 — d_state is the FULL state size
    (conjugate-expanded; the stored params keep d_state/2 pairs)."""
    return jnp.zeros((batch, H, d_state), jnp.complex64)


def s4_step(sp: StepParams, u: jnp.ndarray, state: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One recurrent step (dense mode).  u: (B, H) real; state: (B, H, 2N).

    Returns (y (B, H) real, next_state).  Mirrors ref step + S4.step
    (models/s4.py:995-1001, 1441-1452): x' = dA x + dB u; y = Re(dC x') +
    D u; GELU; GLU output linear.  Unidirectional only.
    """
    next_state = jnp.einsum("hmn,bhn->bhm", sp.dA, state) \
        + sp.dB[None] * u[..., None].astype(sp.dB.dtype)
    y = jnp.einsum("chn,bhn->bch", sp.dC, next_state).real  # (B, c, H)
    y = y + u[:, None, :] * sp.D[None]
    B = y.shape[0]
    y = y.reshape(B, -1)                                    # (B, c*H)
    y = jax.nn.gelu(y, approximate=False)
    z = y @ sp.out_w.T + sp.out_b                           # (B, 2H)
    a, b = jnp.split(z, 2, axis=-1)
    return a * jax.nn.sigmoid(b), next_state
