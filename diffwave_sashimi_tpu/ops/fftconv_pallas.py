"""Fused FFT-convolution Pallas kernel: the S4 global conv at speed of light.

The unfused pipeline (rfft -> spectrum multiply -> irfft) is HBM-bound: each
stage round-trips (B, H, n)-sized intermediates through HBM (~20x the
activation bytes per conv).  This kernel keeps the ENTIRE transform chain in
VMEM per (batch, channel-tile) program:

    load u tile -> four-step DFT (MXU matmuls, ops/mxu_fft.py math)
    -> pointwise multiply with the FACTORIZED frequency kernel
    -> four-step inverse -> write y tile

HBM traffic collapses to read(u) + read(k_f tile) + write(y) — within ~3x of
the activation size.  All DFT/twiddle factors are baked in as VMEM constants.

The convolution kernel enters in factorized (k1, k2) coordinates
(``mxu_fft.rfft_mxu_factorized``), so no flatten/transpose of the spectrum
ever materializes.

Gradients: the op is linear in ``u`` and bilinear with ``kf``; the backward
pass reuses the unfused (jit-fused-enough) mxu_fft formulation via
``jax.vjp`` inside a ``custom_vjp`` — exact, and training uses the unfused
path anyway (kernels are parameter-dependent there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxu_fft

HB = 8  # channel rows per program

# Default True: bf16 MXU multiplies with f32 accumulation inside the kernel
# (matches the bf16 activation policy of the fast path; conv rel err ~4e-3;
# end-to-end sampler matches a CPU f32 reference to 1.7e-4, see tests and
# CLAUDE.md). set_fast(False) = strict f32 (Precision.HIGHEST, ~6x slower).
FAST = {"enabled": True}


def set_fast(enabled: bool) -> None:
    """Process-wide default for the S4 fused-conv fast mode (trace-time)."""
    FAST["enabled"] = bool(enabled)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@functools.lru_cache(maxsize=16)
def _consts(n: int):
    """All factor matrices for forward+inverse, f32 numpy."""
    N1, N2, K2, D1r, D1i, twr, twi, D2r, D2i = mxu_fft._rfft_consts(n)
    (_, _, _, c, E2r, E2i, twmr, twmi, E1r, E1i) = mxu_fft._irfft_consts(n)
    return dict(N1=N1, N2=N2, K2=K2,
                D1rT=D1r.T.copy(), D1iT=D1i.T.copy(),   # (k1, n1)
                twr=twr, twi=twi,                       # (k1, n2)
                D2r=D2r, D2i=D2i,                       # (n2, k2)
                c=c,                                    # (k1, k2)
                E2r=E2r, E2i=E2i,                       # (k2, m2)
                twmr=twmr, twmi=twmi,                   # (k1, m2)
                E1rT=E1r.T.copy(), E1iT=E1i.T.copy())   # (m1, k1)


def _kernel(x_ref, kfr_ref, kfi_ref,
            d1rt_ref, d1it_ref, twr_ref, twi_ref, d2r_ref, d2i_ref,
            c_ref, e2r_ref, e2i_ref, twmr_ref, twmi_ref, e1rt_ref, e1it_ref,
            out_ref, *, fast: bool):
    """Per-channel-row four-step DFT -> kernel multiply -> inverse, fully in
    VMEM. (A row-batched variant using cross-row reshapes was no faster and
    Mosaic rejects its shape casts at small stage sizes.)

    NOTE: inside Pallas on TPU, f32 jnp.dot lowers to bf16 MXU multiplies
    under default precision; ``fast=False`` requests strict f32 via
    Precision.HIGHEST (~6x slower MXU passes).
    """
    f32 = jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                              precision=prec)
    D1rT, D1iT = d1rt_ref[:, :], d1it_ref[:, :]
    twr, twi = twr_ref[:, :], twi_ref[:, :]
    D2r, D2i = d2r_ref[:, :], d2i_ref[:, :]
    c = c_ref[:, :]
    E2r, E2i = e2r_ref[:, :], e2i_ref[:, :]
    twmr, twmi = twmr_ref[:, :], twmi_ref[:, :]
    E1rT, E1iT = e1rt_ref[:, :], e1it_ref[:, :]

    for h in range(HB):                     # static unroll over channel rows
        x = x_ref[0, h]                     # (N1, N2)
        # forward stage 1 (real input)
        Ar = mm(D1rT, x)
        Ai = mm(D1iT, x)
        Br = Ar * twr - Ai * twi
        Bi = Ar * twi + Ai * twr
        # forward stage 2 -> spectrum in (k1, k2)
        Cr = mm(Br, D2r) - mm(Bi, D2i)
        Ci = mm(Br, D2i) + mm(Bi, D2r)
        # pointwise kernel multiply + inverse c-scale
        kr, ki = kfr_ref[h], kfi_ref[h]     # (N1, K2)
        Yr = (Cr * kr - Ci * ki) * c
        Yi = (Cr * ki + Ci * kr) * c
        # inverse stage 1: contract k2
        Sr = mm(Yr, E2r) - mm(Yi, E2i)
        Si = mm(Yr, E2i) + mm(Yi, E2r)
        Tr = Sr * twmr - Si * twmi
        Ti = Sr * twmi + Si * twmr
        # inverse stage 2: contract k1, real part
        out_ref[0, h] = mm(E1rT, Tr) - mm(E1iT, Ti)


def _fftconv_impl(u: jnp.ndarray, kf: jnp.ndarray, n: int, L_out: int,
                  fast: bool = False) -> jnp.ndarray:
    """u: (B, H, L) f32; kf: (2, H, N1, K2) f32 (real/imag factorized).

    Returns (B, H, L_out) f32 = irfft(rfft(u, n) * kf_complex, n)[:L_out].
    """
    cst = _consts(n)
    N1, N2, K2 = cst["N1"], cst["N2"], cst["K2"]
    B, H, L = u.shape
    assert H % HB == 0, f"H={H} must be a multiple of {HB}"
    up = jnp.pad(u.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, n - L))).reshape(B, H, N1, N2)
    kfr, kfi = kf[0], kf[1]

    grid = (B, H // HB)
    const_names = ["D1rT", "D1iT", "twr", "twi", "D2r", "D2i", "c",
                   "E2r", "E2i", "twmr", "twmi", "E1rT", "E1iT"]
    const_arrays = [jnp.asarray(cst[k]) for k in const_names]
    const_specs = [
        pl.BlockSpec(a.shape, lambda b, h: (0,) * a.ndim,
                     memory_space=pltpu.VMEM)
        for a in const_arrays]

    out = pl.pallas_call(
        functools.partial(_kernel, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, HB, N1, N2), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, N1, K2), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, N1, K2), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((1, HB, N1, N2), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N1, N2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(270e6) * B * H, bytes_accessed=u.size * 12,
            transcendentals=0),
        interpret=_interpret(),
    )(up, kfr, kfi, *const_arrays)
    return out.reshape(B, H, n)[..., :L_out]


def _unfused(u, kf, n, L_out):
    """Reference/backward path through the unfused MXU transforms."""
    cst = _consts(n)
    N1, K2 = cst["N1"], cst["K2"]
    U = mxu_fft.rfft_mxu(u.astype(jnp.float32), n)
    half = n // 2 + 1
    # un-factorize kf: (2, H, N1, K2) -> flat (H, half) complex
    kflat = jax.lax.complex(kf[0], kf[1])
    kflat = jnp.swapaxes(kflat, -1, -2).reshape(kf.shape[1], N1 * K2)[:, :half]
    Y = U * kflat
    return mxu_fft.irfft_mxu(Y, n)[..., :L_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fftconv_fused(u: jnp.ndarray, kf: jnp.ndarray, n: int, L_out: int,
                  fast: bool = False) -> jnp.ndarray:
    """Fused S4 convolution (see module docstring)."""
    return _fftconv_impl(u, kf, n, L_out, fast)


def _fwd(u, kf, n, L_out, fast):
    return _fftconv_impl(u, kf, n, L_out, fast), (u, kf)


def _bwd(n, L_out, fast, res, g):
    u, kf = res
    # d/du: adjoint of circular conv with k == conv with time-reversed k,
    # whose spectrum is conj(K) -> the SAME fused kernel with kfi negated.
    # (valid because the op is called with L_out == len(u), as the S4 layer
    # does; the general-slice adjoint would need an extra mask)
    assert u.shape[-1] == L_out, (u.shape, L_out)
    kf_conj = kf * jnp.array([1.0, -1.0], kf.dtype).reshape(2, 1, 1, 1)
    du = _fftconv_impl(g, kf_conj, n, L_out, fast)
    # d/dkf through the unfused formulation (small output, batch-contracted)
    _, vjp_k = jax.vjp(lambda kk: _unfused(u, kk, n, L_out), kf)
    dkf, = vjp_k(g)
    return du, dkf


fftconv_fused.defvjp(_fwd, _bwd)


def factorize_kernel_freq(k_time: jnp.ndarray, n: int) -> jnp.ndarray:
    """(c=1-combined) time kernel (H, L_k) -> factorized (2, H, N1, K2) f32."""
    Cr, Ci = mxu_fft.rfft_mxu_factorized(k_time.astype(jnp.float32), n)
    return jnp.stack([Cr, Ci])
