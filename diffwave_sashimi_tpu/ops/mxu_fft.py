"""MXU-based batched FFT: the four-step Cooley-Tukey algorithm as matmuls.

Why: XLA's native FFT on TPU runs on the vector unit at ~0.3 TFLOP/s
(measured), while the MXU does matmuls at hundreds of TFLOP/s.  The S4
convolution is FFT-bound (60+ transforms of length ~2^15 per network
forward), so we re-express the DFT as dense matrix products:

With n = N1 * N2 and x laid out as x[n1 * N2 + n2]:

    X[k1 + N1*k2] = sum_{n2} W_n^{n2 k1} * (sum_{n1} x[n1,n2] W_{N1}^{n1 k1})
                    * W_{N2}^{n2 k2}

i.e. DFT_N1 matmul over the n1 axis, a twiddle elementwise multiply, and a
DFT_N2 matmul over the n2 axis.  ~5x the FLOPs of an FFT butterfly, executed
~1000x faster per FLOP — a large net win for the sizes used here (2^11..2^16).

Complex arithmetic is carried as split real/imag planes (real-input rfft
needs only 2 real matmuls for stage 1, 4 for stage 2).  DFT/twiddle factor
matrices are f32 host constants baked into the program.  Matmuls run with
``preferred_element_type=f32``; set ``precision`` to HIGHEST for strict-f32
accuracy (default) or DEFAULT for more MXU throughput.

Only the half-spectrum is materialized (rfft semantics); irfft reconstructs
the full spectrum via conjugate symmetry inside the matmul algebra.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Precision modes for the transform matmuls (TPU MXU executes f32 dots as
# k bf16 passes — the mode picks k and the operand dtype):
#   "strict"  f32 operands, Precision.HIGHEST (6-pass): rel err ~3e-7
#   "high"    f32 operands, Precision.HIGH (3-pass bf16x3): ~2x the MXU
#             throughput of strict at rel err ~1e-6 — accurate enough for
#             per-train-step kernel construction (scripts/kern_ablation.py)
#   "fast"    bf16 operands, Precision.DEFAULT (1 pass): ~6x, rel err ~2e-3;
#             also halves HBM traffic.  The S4 conv path exposes this via
#             fft_fast (quality-validated end to end in tests).
_FAST = {"enabled": False}


def set_fast_mode(enabled) -> None:
    """False -> strict, True -> fast, or an explicit mode string.

    Validates eagerly (a typo like "hgih" raises HERE, not at the next
    rfft call far from the bad set site) and stores the normalized mode."""
    _FAST["enabled"] = _norm_mode(enabled)


def _norm_mode(fast) -> str:
    if fast in (None, False, "strict"):
        return "strict"
    if fast in (True, "fast"):
        return "fast"
    if fast == "high":
        return "high"
    raise ValueError(f"bad fft precision mode: {fast!r}")


def _mode_dtype_prec(mode: str):
    if mode == "fast":
        return jnp.bfloat16, jax.lax.Precision.DEFAULT
    if mode == "high":
        return jnp.float32, jax.lax.Precision.HIGH
    return jnp.float32, jax.lax.Precision.HIGHEST


def _split_size(n: int) -> Tuple[int, int]:
    """n = N1 * N2 as square as possible, N2 even (the half-spectrum
    bookkeeping needs it).  Any composite factorization works — the
    four-step derivations below only use W_n^{N1} = W_{N2}; powers of two
    split perfectly, and e.g. the S4 kernel's native n = l_max = 16000
    splits 125 x 128 (lane pads to 128 in the matmuls)."""
    assert n >= 4, n
    if n & (n - 1) == 0:
        log = n.bit_length() - 1
        l1 = log // 2
        return 1 << l1, 1 << (log - l1)
    best = None
    for d in range(int(math.isqrt(n)), 0, -1):
        if n % d == 0:
            n1, n2 = d, n // d
            if n2 % 2 == 0:
                best = (n1, n2)
                break
            if n1 % 2 == 0 and best is None:
                best = (n2, n1)
    assert best is not None, f"no even-factor split for n={n}"
    return best


@lru_cache(maxsize=32)
def _rfft_consts(n: int):
    """Host numpy constants for the forward transform of size n."""
    N1, N2 = _split_size(n)
    # stage 1: A[k1, n2] = sum_n1 x[n1, n2] W_N1^{n1 k1}  (full N1 outputs)
    i1 = np.arange(N1)
    D1 = np.exp(-2j * np.pi * np.outer(i1, i1) / N1)          # (n1, k1)
    # twiddle: W_n^{n2 k1}
    tw = np.exp(-2j * np.pi * np.outer(i1, np.arange(N2)) / n)  # (k1, n2)
    # stage 2: X[k1, k2] = sum_n2 A'[k1, n2] W_N2^{n2 k2}
    i2 = np.arange(N2)
    # we only need k = k1 + N1*k2 for k <= n//2; that's all (k1, k2) pairs
    # with k2 <= N2/2 (plus k1 edge handling); keep k2 in [0, N2/2] and
    # slice the flat result to n//2+1.
    K2 = N2 // 2 + 1
    D2 = np.exp(-2j * np.pi * np.outer(i2, np.arange(K2)) / N2)  # (n2, k2)
    return (N1, N2, K2,
            D1.real.astype(np.float32), D1.imag.astype(np.float32),
            tw.real.astype(np.float32), tw.imag.astype(np.float32),
            D2.real.astype(np.float32), D2.imag.astype(np.float32))


def rfft_mxu(x: jnp.ndarray, n: int, fast=None) -> jnp.ndarray:
    """Real-input FFT of size n (power of two) over the last axis.

    x: (..., L) real with L <= n (zero-padded to n).  Returns complex64
    (..., n//2 + 1), matching ``jnp.fft.rfft(x, n=n)``.

    ``fast`` (None -> the module toggle; False/"strict", "high", or
    True/"fast") picks the precision mode (see the module header).  It
    must be resolved OUT here, not inside the jitted body: the inner jit
    caches the traced jaxpr keyed on (avals, statics) only, so a
    trace-time read of the global toggle bakes in whichever mode traced
    first in the process.
    """
    return _rfft_mxu(x, n, _norm_mode(
        _FAST["enabled"] if fast is None else fast))


@partial(jax.jit, static_argnames=("n", "mode"))
def _rfft_mxu(x: jnp.ndarray, n: int, mode: str) -> jnp.ndarray:
    N1, N2, K2, D1r, D1i, twr, twi, D2r, D2i = _rfft_consts(n)
    L = x.shape[-1]
    if L < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - L)])
    dt, prec = _mode_dtype_prec(mode)
    xf = x.astype(dt).reshape(x.shape[:-1] + (N1, N2))
    D1r_, D1i_ = (jnp.asarray(D1r, dt), jnp.asarray(D1i, dt))

    # stage 1 (real input): (..., n1, n2) x (n1, k1) -> (..., k1, n2)
    kw = dict(precision=prec, preferred_element_type=jnp.float32)
    Ar = jnp.einsum("...ab,ak->...kb", xf, D1r_, **kw)
    Ai = jnp.einsum("...ab,ak->...kb", xf, D1i_, **kw)
    # twiddle (k1, n2)
    Br = (Ar * twr - Ai * twi).astype(dt)
    Bi = (Ar * twi + Ai * twr).astype(dt)
    D2r_, D2i_ = (jnp.asarray(D2r, dt), jnp.asarray(D2i, dt))
    # stage 2: (..., k1, n2) x (n2, k2) -> (..., k1, k2)
    Cr = jnp.einsum("...kb,bc->...kc", Br, D2r_, **kw) \
        - jnp.einsum("...kb,bc->...kc", Bi, D2i_, **kw)
    Ci = jnp.einsum("...kb,bc->...kc", Br, D2i_, **kw) \
        + jnp.einsum("...kb,bc->...kc", Bi, D2r_, **kw)

    # k = k1 + N1*k2: transpose (k1, k2) -> (k2, k1) and flatten, then trim
    out_r = jnp.swapaxes(Cr, -1, -2).reshape(x.shape[:-1] + (N1 * K2,))
    out_i = jnp.swapaxes(Ci, -1, -2).reshape(x.shape[:-1] + (N1 * K2,))
    half = n // 2 + 1
    return jax.lax.complex(out_r[..., :half], out_i[..., :half])


@lru_cache(maxsize=32)
def _irfft_consts(n: int):
    """Constants for the inverse transform: one dense pass per axis.

    irfft(X)[m] = (1/n) sum_k X[k] W_n^{+mk} over the full spectrum; with
    conjugate symmetry folded in, only k in [0, n/2] contributes:
        x[m] = (1/n) [ X[0] + 2*sum_{0<k<n/2} Re(X[k] W^{+mk}) + (-1)^m X[n/2] ]
    We implement it as the same four-step structure on the HALF spectrum by
    building the effective weights for k = k1 + N1*k2 directly.
    """
    N1, N2 = _split_size(n)
    half = n // 2 + 1
    # x[m1*N2 + m2] = (1/n) sum_k c_k Re/Im parts; factorize m = m1*N2 + m2:
    # W_n^{mk} = W_n^{m2 k} * W_{N1}^{m1 k mod N1}; with k = k1 + N1*k2:
    #   W_{N1}^{m1 k} = W_{N1}^{m1 k1}
    # stage A over k2: for each k1, S[k1, m2] = sum_{k2} c_k X[k1+N1 k2] W_{N2'}...
    # Simpler: fold symmetry into scale and do the generic two-stage inverse
    # on the half spectrum with dense (half -> n) in two factors is awkward;
    # instead: stage 1 contracts k2 (size K2=N2/2+1), stage 2 contracts k1.
    K2 = N2 // 2 + 1
    i1, i2 = np.arange(N1), np.arange(N2)
    k2 = np.arange(K2)
    # scale c_k applied on the k2 axis is position-dependent on the FULL k,
    # so fold the doubling into per-(k1,k2) scale:
    #   k = k1 + N1*k2 ; c = 1 for k==0 or k==n/2, else 2
    kk = i1[:, None] + N1 * k2[None, :]
    c = np.where((kk == 0) | (kk == n // 2), 1.0, 2.0) / n      # (N1, K2)
    # entries with k > n/2 (k1 > 0 in the last k2 column) are above-Nyquist
    # aliases: absent from the flat half-spectrum (zero-padded there) but
    # PRESENT in the factorized representation — mask them out of the sum
    c = np.where(kk <= n // 2, c, 0.0)
    # x[m] = sum_{k1,k2} c * Re( X[k1,k2] W_n^{m (k1 + N1 k2)} )
    # with m = m1*N2 + m2:
    #   W_n^{m k1} = W_n^{(m1 N2 + m2) k1} = W_{N1}^{m1 k1} * W_n^{m2 k1}
    #   W_n^{m N1 k2} = W_{N2}^{(m1 N2 + m2) k2} ... note W_n^{N1} = W_{N2}
    #   W_{N2}^{m k2} = W_{N2}^{m2 k2}   (m1 N2 k2 vanishes mod N2)
    # => x[m1, m2] = sum_{k1} W_{N1}^{m1 k1} W_n^{m2 k1}
    #                 * sum_{k2} c X[k1,k2] W_{N2}^{m2 k2}
    E2 = np.exp(2j * np.pi * np.outer(k2, i2) / N2)             # (k2, m2)
    E1 = np.exp(2j * np.pi * np.outer(i1, i1) / N1)             # (k1, m1)
    twm = np.exp(2j * np.pi * np.outer(i1, i2) / n)             # (k1, m2)
    return (N1, N2, K2, c.astype(np.float32),
            E2.real.astype(np.float32), E2.imag.astype(np.float32),
            twm.real.astype(np.float32), twm.imag.astype(np.float32),
            E1.real.astype(np.float32), E1.imag.astype(np.float32))


def irfft_mxu(X: jnp.ndarray, n: int, fast=None) -> jnp.ndarray:
    """Inverse of :func:`rfft_mxu`: (..., n//2+1) complex -> (..., n) real.

    Matches ``jnp.fft.irfft(X, n=n)``.  ``fast`` as in :func:`rfft_mxu`
    (resolved outside the jit cache — see that docstring).
    """
    return _irfft_mxu(X, n, _norm_mode(
        _FAST["enabled"] if fast is None else fast))


@partial(jax.jit, static_argnames=("n", "mode"))
def _irfft_mxu(X: jnp.ndarray, n: int, mode: str) -> jnp.ndarray:
    N1, N2, K2, c, E2r, E2i, twmr, twmi, E1r, E1i = _irfft_consts(n)
    half = n // 2 + 1
    assert X.shape[-1] == half, (X.shape, half)
    # reshape half spectrum to (k2, k1) then to (k1, K2):
    # k = k1 + N1*k2 for k < n/2+1 covers k2 in [0, K2) fully EXCEPT the last
    # row where only k1 == 0 is within range; pad the flat spectrum to
    # N1*K2 with zeros (those entries have c scaled correctly only for real
    # k; padded entries multiply zero) -- but entries k in (n/2, N1*K2) alias
    # conjugates; zero-padding is correct because c folded the doubling into
    # k <= n/2 terms only.
    pad = N1 * K2 - half
    Xr = jnp.pad(X.real.astype(jnp.float32),
                 [(0, 0)] * (X.ndim - 1) + [(0, pad)])
    Xi = jnp.pad(X.imag.astype(jnp.float32),
                 [(0, 0)] * (X.ndim - 1) + [(0, pad)])
    Xr = Xr.reshape(X.shape[:-1] + (K2, N1))   # (k2, k1)
    Xi = Xi.reshape(X.shape[:-1] + (K2, N1))
    dt, prec = _mode_dtype_prec(mode)
    Xr = (jnp.swapaxes(Xr, -1, -2) * c).astype(dt)   # (k1, k2)
    Xi = (jnp.swapaxes(Xi, -1, -2) * c).astype(dt)

    kw = dict(precision=prec, preferred_element_type=jnp.float32)
    E2r_, E2i_ = jnp.asarray(E2r, dt), jnp.asarray(E2i, dt)
    # stage 1: contract k2 -> m2: (..., k1, k2) x (k2, m2)
    Sr = jnp.einsum("...kc,cm->...km", Xr, E2r_, **kw) \
        - jnp.einsum("...kc,cm->...km", Xi, E2i_, **kw)
    Si = jnp.einsum("...kc,cm->...km", Xr, E2i_, **kw) \
        + jnp.einsum("...kc,cm->...km", Xi, E2r_, **kw)
    # twiddle W_n^{m2 k1}: (k1, m2)
    Tr = (Sr * twmr - Si * twmi).astype(dt)
    Ti = (Sr * twmi + Si * twmr).astype(dt)
    E1r_, E1i_ = jnp.asarray(E1r, dt), jnp.asarray(E1i, dt)
    # stage 2: contract k1 -> m1, keep only the real part:
    # x[m1, m2] = Re( sum_k1 E1[k1, m1] * T[k1, m2] )
    x = jnp.einsum("...km,kn->...nm", Tr, E1r_, **kw) \
        - jnp.einsum("...km,kn->...nm", Ti, E1i_, **kw)
    return x.reshape(X.shape[:-1] + (n,))


@partial(jax.jit, static_argnames=("n",))
def rfft_mxu_factorized(x: jnp.ndarray, n: int):
    """Forward transform kept in (k1, k2) coordinates (no flatten/trim).

    Returns (Cr, Ci), each (..., N1, K2) f32 — the representation the fused
    convolution kernel (ops/fftconv_pallas.py) multiplies in directly.
    """
    N1, N2, K2, D1r, D1i, twr, twi, D2r, D2i = _rfft_consts(n)
    L = x.shape[-1]
    if L < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - L)])
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (N1, N2))
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    Ar = jnp.einsum("...ab,ak->...kb", xf, D1r, **kw)
    Ai = jnp.einsum("...ab,ak->...kb", xf, D1i, **kw)
    Br = Ar * twr - Ai * twi
    Bi = Ar * twi + Ai * twr
    Cr = jnp.einsum("...kb,bc->...kc", Br, D2r, **kw) \
        - jnp.einsum("...kb,bc->...kc", Bi, D2i, **kw)
    Ci = jnp.einsum("...kb,bc->...kc", Br, D2i, **kw) \
        + jnp.einsum("...kb,bc->...kc", Bi, D2r, **kw)
    return Cr, Ci
