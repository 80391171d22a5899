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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxu_fft

HB = 8  # channel rows per program

# bf16 matmul operands inside the kernel (f32 accumulation): ~6x MXU rate
# and half the in-kernel bytes. Selected per call via fftconv_fused(...,
# fast=True); model-level knob is S4.conv_fast / compute.fft_fast.
FAST = {"enabled": False}


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
    """All HB channel rows processed as SINGLE large matmuls per stage:
    contractions that share a DFT factor across rows are reshaped so the MXU
    sees (128, HB*256)-scale operands instead of HB small (128, 256) ones.

    NOTE: inside Pallas on TPU, f32 jnp.dot lowers to bf16 MXU
    multiplication under default precision; ``fast=False`` requests
    strict-f32 via Precision.HIGHEST (~6x slower MXU passes).
    """
    f32 = jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                              precision=prec)
    D1rT, D1iT = d1rt_ref[:, :], d1it_ref[:, :]     # (k1, n1)
    twr, twi = twr_ref[:, :], twi_ref[:, :]         # (k1, n2)
    D2r, D2i = d2r_ref[:, :], d2i_ref[:, :]         # (n2, k2)
    c = c_ref[:, :]                                 # (k1, k2)
    E2r, E2i = e2r_ref[:, :], e2i_ref[:, :]         # (k2, m2)
    twmr, twmi = twmr_ref[:, :], twmi_ref[:, :]     # (k1, m2)
    E1rT, E1iT = e1rt_ref[:, :], e1it_ref[:, :]     # (m1, k1)
    N1, N2 = D1rT.shape[0], twr.shape[1]
    K2 = c.shape[1]

    # (HB, N1, N2) -> (N1, HB*N2): rows side by side on the lane axis
    x = jnp.swapaxes(x_ref[0], 0, 1).reshape(N1, HB * N2)
    # forward stage 1: one (N1, N1) @ (N1, HB*N2) pair
    Ar = mm(D1rT, x)
    Ai = mm(D1iT, x)
    twr_w = jnp.tile(twr, (1, HB))
    twi_w = jnp.tile(twi, (1, HB))
    Br = Ar * twr_w - Ai * twi_w
    Bi = Ar * twi_w + Ai * twr_w
    # forward stage 2: contract n2 per row -> (HB*N1, N2) @ (N2, K2)
    def rows_first(t):  # (N1, HB*N2) -> (HB*N1, N2)
        return jnp.swapaxes(t.reshape(N1, HB, N2), 0, 1).reshape(HB * N1, N2)
    Cr = mm(rows_first(Br), D2r) - mm(rows_first(Bi), D2i)   # (HB*N1, K2)
    Ci = mm(rows_first(Br), D2i) + mm(rows_first(Bi), D2r)
    # kernel multiply + c-scale (per-row kernels)
    kr = kfr_ref[:, :, :].reshape(HB * N1, K2)
    ki = kfi_ref[:, :, :].reshape(HB * N1, K2)
    cw = jnp.tile(c, (HB, 1))
    Yr = (Cr * kr - Ci * ki) * cw
    Yi = (Cr * ki + Ci * kr) * cw
    # inverse stage 1: contract k2 -> (HB*N1, K2) @ (K2, N2)
    Sr = mm(Yr, E2r) - mm(Yi, E2i)                           # (HB*N1, N2)
    Si = mm(Yr, E2i) + mm(Yi, E2r)
    twmr_w = jnp.tile(twmr, (HB, 1))
    twmi_w = jnp.tile(twmi, (HB, 1))
    Tr = Sr * twmr_w - Si * twmi_w
    Ti = Sr * twmi_w + Si * twmr_w
    # inverse stage 2: contract k1 -> (N1, N1) @ (N1, HB*N2)
    def cols_first(t):  # (HB*N1, N2) -> (N1, HB*N2)
        return jnp.swapaxes(t.reshape(HB, N1, N2), 0, 1).reshape(N1, HB * N2)
    o = mm(E1rT, cols_first(Tr)) - mm(E1iT, cols_first(Ti))  # (m1, HB*N2)
    out_ref[0] = jnp.swapaxes(o.reshape(N1, HB, N2), 0, 1)


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
    _, vjp = jax.vjp(lambda uu, kk: _unfused(uu, kk, n, L_out), u, kf)
    return vjp(g)


fftconv_fused.defvjp(_fwd, _bwd)


def factorize_kernel_freq(k_time: jnp.ndarray, n: int) -> jnp.ndarray:
    """(c=1-combined) time kernel (H, L_k) -> factorized (2, H, N1, K2) f32."""
    Cr, Ci = mxu_fft.rfft_mxu_factorized(k_time.astype(jnp.float32), n)
    return jnp.stack([Cr, Ci])
