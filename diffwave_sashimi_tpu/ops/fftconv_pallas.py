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


# Channel-batched kernel variant (see _kernel_batched): every DFT stage is
# one large MXU matmul instead of HB small ones.  Measured on v5e it is NOT
# faster end-to-end (5.5-5.9 ms vs 5.2 ms per top-tier conv): the XLA-side
# layout transposes cost ~0.72 ms/conv and the six in-kernel batch swaps
# ~0.2-0.3 ms each, eating the matmul-shape gains.  Kept opt-in for further
# scheduling work (a transpose-free batched-dot_general formulation).
BATCHED = {"enabled": False}


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


def _kernel_batched(x_ref, kfr_ref, kfi_ref,
                    d1r_ref, d1i_ref, twr8_ref, twi8_ref, d2r_ref, d2i_ref,
                    c_ref, e2r_ref, e2i_ref, twmr_ref, twmi_ref,
                    e1r_ref, e1i_ref, out_ref, *, fast: bool):
    """Channel-BATCHED four-step chain: all HB channels share each MXU pass.

    The per-row kernel issues ~80 small dependent matmuls per program and
    measures ~21% MXU efficiency.  Here every stage is ONE large matmul with
    the HB channels merged into the non-contracted dimension; between stages
    the (channel, row, col) tile is re-oriented with a batched last-two-dims
    swap (supported by Mosaic for >=(128,128) tiles — hence the N1 >= 128
    dispatch guard in ``_fftconv_impl``).  Data enters/leaves transposed
    ((..., N2, N1) / (..., m2, m1) order); XLA does those HBM-side layout
    passes, so no cross-row reshape ever happens in VMEM.

    Tile algebra per program (one batch element, HB channels), with
    xm = x^T merged to (HB*N2, N1):
      A^T = xm @ D1          (one MXU pass per real/imag part)
      B^T = A^T * tw^T       (twiddle, pre-tiled over HB)
      B   = swap(B^T)        -> (HB*k1, N2)
      C   = B @ D2           (spectrum, factorized (k1, k2))
      Y   = (C * kf) * c     (kernel multiply + inverse c-scale)
      S   = Y @ E2           -> (HB*k1, m2)
      T   = S * twm
      out^T = swap(T) @ E1   -> (HB*m2, m1)
    """
    f32 = jnp.float32
    # fast mode: bf16 temporaries (halves VMEM pressure so the tile DMAs can
    # double-buffer) with f32 MXU accumulation; strict mode keeps f32 temps
    # and HIGHEST-precision passes.
    tmp = jnp.bfloat16 if fast else f32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                              precision=prec).astype(tmp)
    N2, N1 = x_ref.shape[-2], x_ref.shape[-1]
    K2 = d2r_ref.shape[-1]
    m2, m1 = N2, N1

    xm = x_ref[0, 0].reshape(HB * N2, N1).astype(tmp)  # leading merge: free
    ArT = mm(xm, d1r_ref[:, :])                      # (HB*N2, k1)
    AiT = mm(xm, d1i_ref[:, :])
    twr8 = twr8_ref[:, :].astype(tmp)                # (HB*N2, k1) pre-tiled
    twi8 = twi8_ref[:, :].astype(tmp)
    BrT = ArT * twr8 - AiT * twi8
    BiT = ArT * twi8 + AiT * twr8
    # re-orient: (HB, N2, k1) -> (HB, k1, N2) -> merge -> (HB*k1, N2)
    k1 = N1
    Br = jnp.swapaxes(BrT.reshape(HB, N2, k1), -1, -2).reshape(HB * k1, N2)
    Bi = jnp.swapaxes(BiT.reshape(HB, N2, k1), -1, -2).reshape(HB * k1, N2)
    D2r, D2i = d2r_ref[:, :], d2i_ref[:, :]
    Cr = mm(Br, D2r) - mm(Bi, D2i)                   # (HB*k1, K2)
    Ci = mm(Br, D2i) + mm(Bi, D2r)
    # pointwise kernel multiply + inverse c-scale, in (HB, k1, K2)
    Cr3, Ci3 = Cr.reshape(HB, k1, K2), Ci.reshape(HB, k1, K2)
    kr = kfr_ref[0].astype(tmp)                      # (HB, k1, K2)
    ki = kfi_ref[0].astype(tmp)
    c = c_ref[:, :].astype(tmp)                      # (k1, K2) broadcast
    Yr = ((Cr3 * kr - Ci3 * ki) * c).reshape(HB * k1, K2)
    Yi = ((Cr3 * ki + Ci3 * kr) * c).reshape(HB * k1, K2)
    E2r, E2i = e2r_ref[:, :], e2i_ref[:, :]
    Sr = mm(Yr, E2r) - mm(Yi, E2i)                   # (HB*k1, m2)
    Si = mm(Yr, E2i) + mm(Yi, E2r)
    twmr = twmr_ref[:, :].astype(tmp)                # (k1, m2) broadcast
    twmi = twmi_ref[:, :].astype(tmp)
    Sr3, Si3 = Sr.reshape(HB, k1, m2), Si.reshape(HB, k1, m2)
    Tr3 = Sr3 * twmr - Si3 * twmi
    Ti3 = Sr3 * twmi + Si3 * twmr
    TrT = jnp.swapaxes(Tr3, -1, -2).reshape(HB * m2, k1)
    TiT = jnp.swapaxes(Ti3, -1, -2).reshape(HB * m2, k1)
    outT = (mm(TrT, e1r_ref[:, :]).astype(f32)
            - mm(TiT, e1i_ref[:, :]).astype(f32))            # (HB*m2, m1)
    out_ref[0, 0] = outT.reshape(HB, m2, m1)


def _fftconv_batched(u: jnp.ndarray, kf: jnp.ndarray, n: int, L_out: int,
                     fast: bool) -> jnp.ndarray:
    """Channel-batched fused conv; requires N1 >= 128 (see _kernel_batched)."""
    cst = _consts(n)
    N1, N2, K2 = cst["N1"], cst["N2"], cst["K2"]
    B, H, L = u.shape
    assert H % HB == 0, f"H={H} must be a multiple of {HB}"
    G = H // HB
    # (B, H, n) -> (B, G, HB, N2, N1): transposed (column-major per channel)
    up = jnp.pad(u.astype(jnp.float32), ((0, 0), (0, 0), (0, n - L)))
    upT = jnp.swapaxes(up.reshape(B, G, HB, N1, N2), -1, -2)
    kfr = kf[0].reshape(G, HB, N1, K2)
    kfi = kf[1].reshape(G, HB, N1, K2)

    # consts, oriented for the transposed dataflow
    D1r, D1i = cst["D1rT"].T.copy(), cst["D1iT"].T.copy()       # (N1, k1)
    twr8 = jnp.tile(jnp.asarray(cst["twr"].T), (HB, 1))         # (HB*N2, k1)
    twi8 = jnp.tile(jnp.asarray(cst["twi"].T), (HB, 1))
    E1r, E1i = cst["E1rT"].T.copy(), cst["E1iT"].T.copy()       # (k1, m1)
    const_arrays = [jnp.asarray(a) for a in
                    (D1r, D1i, twr8, twi8, cst["D2r"], cst["D2i"], cst["c"],
                     cst["E2r"], cst["E2i"], cst["twmr"], cst["twmi"],
                     E1r, E1i)]
    const_specs = [
        pl.BlockSpec(a.shape, lambda b, h: (0,) * a.ndim,
                     memory_space=pltpu.VMEM)
        for a in const_arrays]

    # grid (G, B): batch is the INNER loop, so the per-group kernel-spectrum
    # blocks stay VMEM-resident across all B programs (fetched G times total)
    grid = (G, B)
    out = pl.pallas_call(
        functools.partial(_kernel_batched, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, HB, N2, N1), lambda h, b: (b, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, N1, K2), lambda h, b: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, N1, K2), lambda h, b: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((1, 1, HB, N2, N1), lambda h, b: (b, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, HB, N2, N1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(101e6) * B * H, bytes_accessed=u.size * 12,
            transcendentals=0),
        interpret=_interpret(),
    )(upT, kfr, kfi, *const_arrays)
    # out is (B, G, HB, m2, m1) transposed; XLA restores time order
    out = jnp.swapaxes(out, -1, -2).reshape(B, H, n)
    return out[..., :L_out]


def _fftconv_impl(u: jnp.ndarray, kf: jnp.ndarray, n: int, L_out: int,
                  fast: bool = False) -> jnp.ndarray:
    """u: (B, H, L) f32; kf: (2, H, N1, K2) f32 (real/imag factorized).

    Returns (B, H, L_out) f32 = irfft(rfft(u, n) * kf_complex, n)[:L_out].

    Dispatch: the per-row kernel by default; the channel-batched variant
    (opt-in via ``BATCHED``, requires both DFT factors >= 128) measured
    slower end-to-end on v5e — see the note at ``BATCHED``.
    """
    cst = _consts(n)
    N1, N2, K2 = cst["N1"], cst["N2"], cst["K2"]
    if BATCHED["enabled"] and N1 >= 128 and N2 >= 128:
        return _fftconv_batched(u, kf, n, L_out, fast)
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
