"""Layout-native fused FFT convolution, v2: the S4 global conv as four
standard MXU matmuls with zero transposes.

The v1 kernel (ops/fftconv_pallas.py) is issue-bound: per (batch, channel)
it chains ~12 small dependent matmuls whose spectrum tensors carry a
K2 = N2/2+1 = 129 lane dimension (padded to 256 lanes by the VMEM tiling —
2x wasted MXU time on the two middle stages), and its channel-batched
variant loses its gains to XLA-side layout transposes plus in-kernel
lane<->sublane swaps.

v2 removes all of that by CHOOSING THE ACTIVATION LAYOUT to fit the
dataflow.  With n = R*S and time split t = t1*S + t2 (t1 "major", t2
"minor"), activations are stored COMPACTLY as (B, H, S, Rc) where the lane
axis is t1 in [0, Rc), Rc*S >= L (e.g. L=16000 -> n=32768, R=128, S=256,
Rc=64).  In this layout the whole transform chain is:

    S1  A[t2,kr] = sum_t1 u[t2,t1] W_R^{t1 kr}   data-lhs  (HB*S, Rc)@(Rc, R)
    tw  B = A * W_n^{t2 kr}                       elementwise, (S, R) const
    S2  X[ks,kr] = sum_t2 B[t2,kr] W_S^{t2 ks}    const-lhs (S/2, S)@(S, HB*R)
    *   Y = X * K_hat   (+ Nyquist rank-1 fixup)  elementwise
    iA  Z[t2,kr] = sum_ks Y[ks,kr] W_S^{-t2 ks}   const-lhs (S, S/2)@(S/2, HB*R)
    tw  T = Z * W_n^{-t2 kr}
    iB  y[t2,t1] = Re sum_kr T[t2,kr] W_R^{-t1kr} data-lhs  (HB*S, R)@(R, Rc)

Every stage is a standard matmul (contract lhs-lane x rhs-sublane); the two
"permutes" between data-lhs and const-lhs orientation are leading-dim moves
at full-lane-tile granularity (cheap VPU copies, never lane<->sublane
shuffles).  The output comes back in EXACTLY the input layout, so
activations stay in this layout across the whole S4 block and the sampling
step; only pool boundaries relayout (in XLA).

Spectrum bookkeeping (vs v1's K2 = N2/2+1 lane waste): the half spectrum
k = kr + R*ks needs ks in [0, S/2) with FULL kr range — an exact
(S/2, R) = (128, 128) tile — plus the single Nyquist bin k = n/2
(ks = S/2, kr = 0), which is handled as a rank-1 correction on the VPU:
X_nyq = sum_t u[t] (-1)^t (a row-signed reduction, since (-1)^t = (-1)^{t2}
for even S) and y += (-1)^{t2} * X_nyq * K_nyq / n.

The irfft's conjugate-symmetry scale c_k (2/n, except 1/n at k=0 and n/2)
is folded into the kernel spectrum at build time (kernel_spectrum), so the
multiply stage is a plain complex product.

Zero-skip: the input's valid region t < L means lanes t1 >= Rc are never
stored and S1 contracts only K = Rc (half of R); the output is only needed
for t < Rc*S so iB emits N = Rc lanes.  Together with the exact spectrum
tile this is ~2x fewer EFFECTIVE (post-padding) MACs than v1.

Reference parity point: this computes the same values as the reference's
FFT convolution (reference models/s4.py:1403-1406) with the kernel's
irfft/scale algebra folded in, for the rebuild's power-of-two FFT size.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


class Layout(NamedTuple):
    """Static per-tier layout: n = R*S, compact lanes Rc (Rc*S >= L)."""
    n: int      # FFT size (power of two)
    R: int      # major factor = spectrum kr lanes
    S: int      # minor factor = sublane rows (t2)
    Rc: int     # compact lane count (t1 < Rc stored; Rc*S >= L)
    L: int      # valid sample count (t < L)
    HB: int     # channels per kernel program

    @property
    def Lc(self) -> int:
        return self.Rc * self.S


def choose_layout(L: int, n: int, H: int) -> Layout:
    """Pick (R, S, Rc, HB) for a tier.  R is the lane dim of all spectrum
    tensors — keep it at 128 whenever possible."""
    assert n & (n - 1) == 0 and n >= 256, n
    R = min(128, n // 8)
    S = n // R
    Rc = -(-L // S)  # ceil: lanes needed to cover L
    # round Rc up to a power of two (tile-friendly), capped at R
    Rc = 1 << (Rc - 1).bit_length()
    Rc = min(Rc, R)
    assert Rc * S >= L, (Rc, S, L)
    HB = 8
    # cap the largest f32 temp (HB*S, R) at ~1 MB so the whole chain +
    # double-buffered IO tiles fits comfortably in 16 MB VMEM
    while HB < 32 and H % (HB * 2) == 0 and (HB * 2) * S * R <= 2 ** 18:
        HB *= 2  # small tiers: more channels per program, bigger matmuls
    assert H % HB == 0, (H, HB)
    return Layout(n=n, R=R, S=S, Rc=Rc, L=L, HB=HB)


def to_compact(x: jnp.ndarray, lay: Layout) -> jnp.ndarray:
    """(B, H, L') flat time -> (B, H, S, Rc) compact layout (L' <= Rc*S)."""
    B, H, Lx = x.shape
    assert Lx <= lay.Lc, (Lx, lay)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, lay.Lc - Lx)))
    x = x.reshape(B, H, lay.Rc, lay.S)       # rows t1 (major), cols t2
    return jnp.swapaxes(x, -1, -2)           # (B, H, S, Rc)


def from_compact(xc: jnp.ndarray, lay: Layout, L: Optional[int] = None
                 ) -> jnp.ndarray:
    """(B, H, S, Rc) -> (B, H, L) flat time."""
    B, H = xc.shape[:2]
    x = jnp.swapaxes(xc, -1, -2).reshape(B, H, lay.Lc)
    return x[..., :lay.L if L is None else L]


@functools.lru_cache(maxsize=32)
def _consts(lay: Layout):
    """f32 numpy factor matrices for the layout (host constants)."""
    n, R, S, Rc, L = lay.n, lay.R, lay.S, lay.Rc, lay.L
    t1 = np.arange(Rc)
    kr = np.arange(R)
    t2 = np.arange(S)
    ks = np.arange(S // 2)
    Dr = np.exp(-2j * np.pi * np.outer(t1, kr) / R)      # (Rc, R)
    tw = np.exp(-2j * np.pi * np.outer(t2, kr) / n)      # (S, R)
    Ds = np.exp(-2j * np.pi * np.outer(ks, t2) / S)      # (S/2, S)
    Es = np.exp(2j * np.pi * np.outer(t2, ks) / S)       # (S, S/2)
    twm = np.exp(2j * np.pi * np.outer(t2, kr) / n)      # (S, R)
    Er = np.exp(2j * np.pi * np.outer(kr, t1) / R)       # (R, Rc)
    # valid-sample mask in (t2, t1) coordinates: t = t1*S + t2 < L
    mask = (t1[None, :] * S + t2[:, None] < L).astype(np.float32)  # (S, Rc)
    sgn = np.where(t2 % 2 == 0, 1.0, -1.0).astype(np.float32)      # (-1)^{t2}
    f32 = np.float32
    return dict(
        Drr=Dr.real.astype(f32), Dri=Dr.imag.astype(f32),
        twr=tw.real.astype(f32), twi=tw.imag.astype(f32),
        Dsr=Ds.real.astype(f32), Dsi=Ds.imag.astype(f32),
        Esr=Es.real.astype(f32), Esi=Es.imag.astype(f32),
        twmr=twm.real.astype(f32), twmi=twm.imag.astype(f32),
        Err=Er.real.astype(f32), Eri=Er.imag.astype(f32),
        mask=mask, sgn=sgn)


def kernel_spectrum(k_time: jnp.ndarray, lay: Layout) -> tuple:
    """Combined time kernel (H, n) (or (H, <=n), zero-extended) ->
    (kfr, kfi, knyq): kfr/kfi (G, S/2, HB, R) f32 with the inverse-transform
    scale c_k folded in; knyq (G, HB, 1) f32.

    The multiply layout (ks, (h, kr)) matches the kernel program's spectrum
    tensor exactly, so no transposes happen at conv time.
    """
    n, R, S, HB = lay.n, lay.R, lay.S, lay.HB
    H = k_time.shape[0]
    G = H // HB
    from . import mxu_fft
    if jax.default_backend() in ("tpu", "axon"):
        Kf = mxu_fft.rfft_mxu(k_time.astype(jnp.float32), n)
    else:
        Kf = jnp.fft.rfft(k_time.astype(jnp.float32), n=n)
    c = jnp.full((n // 2,), 2.0 / n, jnp.float32).at[0].set(1.0 / n)
    Khat = Kf[:, : n // 2] * c                            # (H, n/2)
    Khat = Khat.reshape(H, S // 2, R)                     # [h, ks, kr]
    Khat = Khat.reshape(G, HB, S // 2, R).transpose(0, 2, 1, 3)
    knyq = (Kf[:, n // 2].real / n).reshape(G, HB, 1).astype(jnp.float32)
    return (Khat.real.astype(jnp.float32), Khat.imag.astype(jnp.float32),
            knyq)


def conv2_ref(xc: jnp.ndarray, kfr: jnp.ndarray, kfi: jnp.ndarray,
              knyq: jnp.ndarray, lay: Layout) -> jnp.ndarray:
    """Pure-XLA reference of the exact kernel math (tests, CPU fallback,
    and the route for kernel-spectrum gradients in the custom VJP)."""
    c = _consts(lay)
    S, R, Rc, HB = lay.S, lay.R, lay.Rc, lay.HB
    B, H = xc.shape[:2]
    G = H // HB
    x = xc.astype(jnp.float32) * c["mask"]
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    Ar = jnp.einsum("bhsr,rk->bhsk", x, c["Drr"], **kw)
    Ai = jnp.einsum("bhsr,rk->bhsk", x, c["Dri"], **kw)
    Br = Ar * c["twr"] - Ai * c["twi"]
    Bi = Ar * c["twi"] + Ai * c["twr"]
    Xr = jnp.einsum("qs,bhsk->bhqk", c["Dsr"], Br, **kw) \
        - jnp.einsum("qs,bhsk->bhqk", c["Dsi"], Bi, **kw)
    Xi = jnp.einsum("qs,bhsk->bhqk", c["Dsr"], Bi, **kw) \
        + jnp.einsum("qs,bhsk->bhqk", c["Dsi"], Br, **kw)
    # kernel multiply in (ks, kr); spectra arrive (G, S/2, HB, R)
    Kr = kfr.transpose(0, 2, 1, 3).reshape(H, S // 2, R)
    Ki = kfi.transpose(0, 2, 1, 3).reshape(H, S // 2, R)
    Yr = Xr * Kr - Xi * Ki
    Yi = Xr * Ki + Xi * Kr
    Zr = jnp.einsum("sq,bhqk->bhsk", c["Esr"], Yr, **kw) \
        - jnp.einsum("sq,bhqk->bhsk", c["Esi"], Yi, **kw)
    Zi = jnp.einsum("sq,bhqk->bhsk", c["Esr"], Yi, **kw) \
        + jnp.einsum("sq,bhqk->bhsk", c["Esi"], Yr, **kw)
    Tr = Zr * c["twmr"] - Zi * c["twmi"]
    Ti = Zr * c["twmi"] + Zi * c["twmr"]
    y = jnp.einsum("bhsk,kr->bhsr", Tr, c["Err"], **kw) \
        - jnp.einsum("bhsk,kr->bhsr", Ti, c["Eri"], **kw)
    # Nyquist rank-1 fixup
    xn = jnp.einsum("bhsr,s->bh", x, c["sgn"], **kw)
    kn = knyq.reshape(H)
    y = y + c["sgn"][None, None, :, None] \
        * (xn * kn)[:, :, None, None]
    return (y * c["mask"]).astype(xc.dtype)


def _kernel(u_ref, kfr_ref, kfi_ref, knyq_ref, d_ref,
            drr, dri, twr, twi, dsr, dsi, esr, esi, twmr, twmi, err, eri,
            mask_ref, sgn_ref, out_ref, *,
            lay: Layout, fast: bool, post: str):
    """One (channel-group, batch) program; see module docstring for the
    stage algebra.  post: 'none' | 'gelu_d' (fused D-skip + exact GELU)."""
    S, R, Rc, HB = lay.S, lay.R, lay.Rc, lay.HB
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                              precision=prec)

    mask = mask_ref[:, :]                                 # (S, Rc) f32
    x = u_ref[0, 0].astype(f32) * mask                    # (HB, S, Rc)
    xm = x.astype(tmp).reshape(HB * S, Rc)

    # S1: contract t1 lanes
    Ar = mm(xm, drr[:, :].astype(tmp))                    # (HB*S, R) f32
    Ai = mm(xm, dri[:, :].astype(tmp))
    # twiddle (S, R), broadcast over HB
    Ar = Ar.reshape(HB, S, R)
    Ai = Ai.reshape(HB, S, R)
    tr = twr[:, :].astype(f32)
    ti = twi[:, :].astype(f32)
    Br = (Ar * tr - Ai * ti).astype(tmp)
    Bi = (Ar * ti + Ai * tr).astype(tmp)
    # reorient for const-lhs stages: (HB, S, R) -> (S, HB*R)
    Bpr = jnp.swapaxes(Br, 0, 1).reshape(S, HB * R)
    Bpi = jnp.swapaxes(Bi, 0, 1).reshape(S, HB * R)

    # S2: contract t2 rows
    Dsr_, Dsi_ = dsr[:, :].astype(tmp), dsi[:, :].astype(tmp)
    Xr = mm(Dsr_, Bpr) - mm(Dsi_, Bpi)                    # (S/2, HB*R) f32
    Xi = mm(Dsr_, Bpi) + mm(Dsi_, Bpr)

    # kernel multiply (c-scale folded into kf at build time)
    Kr = kfr_ref[0].reshape(S // 2, HB * R)
    Ki = kfi_ref[0].reshape(S // 2, HB * R)
    Yr = (Xr * Kr - Xi * Ki).astype(tmp)
    Yi = (Xr * Ki + Xi * Kr).astype(tmp)

    # iA: contract ks rows
    Esr_, Esi_ = esr[:, :].astype(tmp), esi[:, :].astype(tmp)
    Zr = mm(Esr_, Yr) - mm(Esi_, Yi)                      # (S, HB*R) f32
    Zi = mm(Esr_, Yi) + mm(Esi_, Yr)
    Zr = Zr.reshape(S, HB, R)
    Zi = Zi.reshape(S, HB, R)
    tmr = twmr[:, :].astype(f32)[:, None, :]
    tmi = twmi[:, :].astype(f32)[:, None, :]
    Tr = (Zr * tmr - Zi * tmi).astype(tmp)
    Ti = (Zr * tmi + Zi * tmr).astype(tmp)
    # reorient back to data-lhs: (S, HB, R) -> (HB*S, R)
    Tmr = jnp.swapaxes(Tr, 0, 1).reshape(HB * S, R)
    Tmi = jnp.swapaxes(Ti, 0, 1).reshape(HB * S, R)

    # iB: contract kr lanes, Re part, emit only t1 < Rc
    y = mm(Tmr, err[:, :].astype(tmp)) - mm(Tmi, eri[:, :].astype(tmp))
    y = y.reshape(HB, S, Rc)

    # Nyquist rank-1 fixup: X_nyq = sum u * (-1)^{t2} (real input)
    sgn = sgn_ref[:, :]                                   # (S, 1) f32
    xn = jnp.sum(x * sgn[None, :, :1], axis=(1, 2), keepdims=True)  # (HB,1,1)
    kn = knyq_ref[0][:, :, None]                          # (HB, 1, 1)
    y = y + sgn[None, :, :1] * (xn * kn)

    if post == "gelu_d":
        y = y + d_ref[0][:, :, None] * x                  # + D * u skip
        y = jax.nn.gelu(y, approximate=False)
    out_ref[0, 0] = (y * mask).astype(out_ref.dtype)


def _conv2_impl(u: jnp.ndarray, kfr: jnp.ndarray, kfi: jnp.ndarray,
                knyq: jnp.ndarray, d: Optional[jnp.ndarray],
                lay: Layout, fast: bool, post: str,
                out_dtype=None) -> jnp.ndarray:
    """u: (B, H, S, Rc); kf*: (G, S/2, HB, R); knyq/d: (G, HB, 1)."""
    S, R, Rc, HB = lay.S, lay.R, lay.Rc, lay.HB
    B, H = u.shape[:2]
    assert u.shape[2:] == (S, Rc), (u.shape, lay)
    G = H // HB
    out_dtype = out_dtype or u.dtype
    c = _consts(lay)
    if d is None:
        d = jnp.zeros((G, HB, 1), jnp.float32)

    u5 = u.reshape(B, G, HB, S, Rc)
    const_names = ["Drr", "Dri", "twr", "twi", "Dsr", "Dsi", "Esr", "Esi",
                   "twmr", "twmi", "Err", "Eri", "mask"]
    const_arrays = [jnp.asarray(c[k]) for k in const_names]
    const_arrays.append(jnp.asarray(c["sgn"]).reshape(S, 1))
    const_specs = [
        pl.BlockSpec(a.shape, lambda g, b: (0,) * a.ndim,
                     memory_space=pltpu.VMEM)
        for a in const_arrays]

    # grid (G, B): batch minor, so each group's kernel spectrum stays
    # VMEM-resident across all B programs
    flops_mm = 2 * (2 * S * Rc * R + 4 * (S // 2) * S * R
                    + 4 * S * (S // 2) * R + 2 * S * R * Rc) * HB
    out = pl.pallas_call(
        functools.partial(_kernel, lay=lay, fast=fast, post=post),
        grid=(G, B),
        in_specs=[
            pl.BlockSpec((1, 1, HB, S, Rc), lambda g, b: (b, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S // 2, HB, R), lambda g, b: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S // 2, HB, R), lambda g, b: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, 1), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, 1), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((1, 1, HB, S, Rc), lambda g, b: (b, g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, HB, S, Rc), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm * G * B,
            bytes_accessed=u.size * 2 * u.dtype.itemsize + kfr.size * 8,
            transcendentals=(u.size if post == "gelu_d" else 0)),
        interpret=_interpret(),
    )(u5, kfr, kfi, knyq, d, *const_arrays)
    return out.reshape(B, H, S, Rc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fftconv2(u, kfr, kfi, knyq, lay: Layout, fast: bool = True):
    """Fused S4 convolution in compact layout (no epilogue; differentiable).

    u (B, H, S, Rc) -> y (B, H, S, Rc), where y is mask*Conv_k(mask*u): the
    circular-n convolution by the kernel whose (c-folded) spectrum is
    (kfr, kfi, knyq), with both input and output restricted to t < L.
    """
    if _interpret():
        return conv2_ref(u, kfr, kfi, knyq, lay)
    return _conv2_impl(u, kfr, kfi, knyq, None, lay, fast, "none")


def _fwd(u, kfr, kfi, knyq, lay, fast):
    return fftconv2(u, kfr, kfi, knyq, lay, fast), (u, kfr, kfi, knyq)


def _bwd(lay, fast, res, g):
    u, kfr, kfi, knyq = res
    # d/du: adjoint of mask.Conv_k.mask = mask.Conv_{k reversed}.mask,
    # i.e. the SAME op with the conjugate spectrum (k is real).
    du = fftconv2(g, kfr, -kfi, knyq, lay, fast)
    # d/dkf via the XLA reference (same math, autodiffed)
    _, vjp_k = jax.vjp(
        lambda a, b, c_: conv2_ref(u, a, b, c_, lay), kfr, kfi, knyq)
    dkfr, dkfi, dknyq = vjp_k(g.astype(u.dtype))
    return du.astype(u.dtype), dkfr, dkfi, dknyq


fftconv2.defvjp(_fwd, _bwd)


def fftconv2_gelu_d(u, kfr, kfi, knyq, d, lay: Layout, fast: bool = True):
    """Sampling fast path: conv + D*u skip + exact GELU fused in-kernel.

    Not differentiable (no VJP) — the training path uses :func:`fftconv2`
    with the epilogue in XLA.
    """
    if _interpret():
        y = conv2_ref(u, kfr, kfi, knyq, lay)
        c = _consts(lay)
        y = y + d.reshape(1, -1, 1, 1) * (u * c["mask"]).astype(y.dtype)
        return (jax.nn.gelu(y.astype(jnp.float32), approximate=False)
                * c["mask"]).astype(u.dtype)
    return _conv2_impl(u, kfr, kfi, knyq, d.reshape(d.shape[0] // lay.HB,
                                                    lay.HB, 1),
                       lay, fast, "gelu_d")
