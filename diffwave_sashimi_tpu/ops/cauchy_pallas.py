"""Fused Pallas TPU kernel for the symmetric Cauchy resolvent sum.

The TPU-native replacement for the reference CUDA extension
(extensions/cauchy/cauchy_cuda.cu: shared-memory staging + warp-shuffle
reductions).  Same mathematical object as ops/cauchy.py:

    out[m, l] = sum_n (a[m,n] z_l + b[m,n]) / (z_l^2 + c[m,n] z_l + d[m,n])

with all-real coefficients (a = 2 Re v, b = -2 Re(v conj w), c = -2 Re w,
d = |w|^2) and complex z carried as split (re, im) planes — Pallas has no
complex dtype, and the real-pair form needs no complex arithmetic at all.

Why a kernel: the XLA formulation must materialize the (H, N, L) basis
tensors G0/G1 in HBM (hundreds of MB at d_model=128, L=16000); this kernel
keeps everything in VMEM and streams only the (M, L) output — ~20x less HBM
traffic for the S4 kernel construction that runs every training step.

Backward pass: a second Pallas kernel computes the closed-form coefficient
gradients (the analogue of cauchy_mult_sym_bwd, cauchy_cuda.cu:377-487);
gradients flow to (v, w) through the jnp coefficient construction in the
wrapper, so ``jax.grad`` works end-to-end via ``custom_vjp``.

Grid: (M/bm, L/bl) for forward (output-tile parallel); (M/bm,) for backward
(full-L reduction per tile).  The N loop (d_state/2, typically 32) is
unrolled in-register.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Forward tile sizes: M on sublanes, L on lanes.
# Defaults from the on-chip autotune sweep (ops/tune.py, cauchy_tune.json):
# (32, 1024) is best/near-best on every S4 operating point (1.9-3.3x XLA).
BM, BL = 32, 1024
# Backward holds FULL-L rows in VMEM (reduction over L per tile): a narrow
# tile keeps the scoped VMEM stack under the 16MB limit at L'~8k.
BM_BWD = 8


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests); compiled on TPU.

    The axon PJRT plugin reports platform "axon" for real TPU hardware."""
    return jax.default_backend() not in ("tpu", "axon")
# Backward reduces over all of L in VMEM; above this, fall back to XLA.
MAX_BWD_L = 32768


def _fwd_kernel(a_ref, b_ref, c_ref, d_ref, zre_ref, zim_ref,
                out_re_ref, out_im_ref):
    """a, b: (K, BM, N) numerator coeffs per component; c, d: (BM, N)
    denominator coeffs SHARED across the K components (they come from w
    only) — the reciprocal, the most expensive op here, is computed once
    per (m, n, l) and reused by all K numerators (K = (1+r)(c+r) = 6 for
    the bidirectional rank-1 S4 layer)."""
    zre = zre_ref[0, :]                       # (BL,)
    zim = zim_ref[0, :]
    z2re = zre * zre - zim * zim              # z^2
    z2im = 2.0 * zre * zim
    K, _, N = a_ref.shape

    acc_re = [jnp.zeros(out_re_ref.shape[1:], jnp.float32)
              for _ in range(K)]
    acc_im = [jnp.zeros(out_re_ref.shape[1:], jnp.float32)
              for _ in range(K)]
    for n in range(N):                        # static unroll over states
        cn = c_ref[:, n:n + 1]                # (BM, 1)
        dn = d_ref[:, n:n + 1]
        den_re = z2re[None, :] + cn * zre[None, :] + dn
        den_im = z2im[None, :] + cn * zim[None, :]
        inv = 1.0 / (den_re * den_re + den_im * den_im)
        g0_re = den_re * inv                  # 1/den, shared
        g0_im = -den_im * inv
        for k in range(K):
            an = a_ref[k, :, n:n + 1]
            bn = b_ref[k, :, n:n + 1]
            num_re = an * zre[None, :] + bn
            num_im = an * zim[None, :]
            acc_re[k] += num_re * g0_re - num_im * g0_im
            acc_im[k] += num_im * g0_re + num_re * g0_im
    for k in range(K):
        out_re_ref[k] = acc_re[k]
        out_im_ref[k] = acc_im[k]


def _bwd_kernel(a_ref, b_ref, c_ref, d_ref, zre_ref, zim_ref,
                gre_ref, gim_ref, da_ref, db_ref, dc_ref, dd_ref):
    """Closed-form coefficient grads with the denominator chain (den, inv,
    G0, G1) computed once per (m, n, l) and shared by all K components;
    dc/dd accumulate over K (c, d are shared inputs)."""
    zre = zre_ref[0, :]
    zim = zim_ref[0, :]
    z2re = zre * zre - zim * zim
    z2im = 2.0 * zre * zim
    K, _, N = a_ref.shape

    for n in range(N):
        cn = c_ref[:, n:n + 1]
        dn = d_ref[:, n:n + 1]
        den_re = z2re[None, :] + cn * zre[None, :] + dn
        den_im = z2im[None, :] + cn * zim[None, :]
        inv = 1.0 / (den_re * den_re + den_im * den_im)
        # G0 = 1/den, G1 = z/den
        g0_re = den_re * inv
        g0_im = -den_im * inv
        g1_re = (zre[None, :] * den_re + zim[None, :] * den_im) * inv
        g1_im = (zim[None, :] * den_re - zre[None, :] * den_im) * inv
        # A = sum_k a_kn conj(g_k), Bb = sum_k b_kn conj(g_k): collapses
        # the dc/dd component loop — dc_n = -sum_l Re(G1 G0 (z A + Bb)),
        # dd_n = -sum_l Re(G0 G0 (z A + Bb))  (num_k = a_k z + b_k and
        # q_k = num_k G0 are linear in the coefficients)
        A_re = jnp.zeros_like(g0_re)
        A_im = jnp.zeros_like(g0_re)
        B_re = jnp.zeros_like(g0_re)
        B_im = jnp.zeros_like(g0_re)
        for k in range(K):
            gre = gre_ref[k]                  # (BM, L)
            gim = gim_ref[k]
            an = a_ref[k, :, n:n + 1]
            bn = b_ref[k, :, n:n + 1]
            # d a = sum_l g . dout/da, dout/da = G1 (complex, split parts)
            da_ref[k, :, n:n + 1] = jnp.sum(
                gre * g1_re + gim * g1_im, axis=1, keepdims=True)
            db_ref[k, :, n:n + 1] = jnp.sum(
                gre * g0_re + gim * g0_im, axis=1, keepdims=True)
            A_re += an * gre
            A_im -= an * gim
            B_re += bn * gre
            B_im -= bn * gim
        # T = z A + Bb ; W = G0 T
        t_re = zre[None, :] * A_re - zim[None, :] * A_im + B_re
        t_im = zre[None, :] * A_im + zim[None, :] * A_re + B_im
        w_re = g0_re * t_re - g0_im * t_im
        w_im = g0_re * t_im + g0_im * t_re
        dd_ref[:, n:n + 1] = -jnp.sum(g0_re * w_re - g0_im * w_im,
                                      axis=1, keepdims=True)
        dc_ref[:, n:n + 1] = -jnp.sum(g1_re * w_re - g1_im * w_im,
                                      axis=1, keepdims=True)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@jax.custom_vjp
def _cauchy_quad(a, b, c, d, zre, zim):
    return _cauchy_quad_fwd_impl(a, b, c, d, zre, zim)


def _cauchy_quad_fwd_impl(a, b, c, d, zre, zim):
    K, M, N = a.shape
    L = zre.shape[0]
    a_p = _pad_to(a, 1, BM)
    b_p = _pad_to(b, 1, BM)
    c_p = _pad_to(c, 0, BM)
    # pad d with 1s so padded denominators are 1 (avoid 0/0)
    d_p = _pad_to(d, 0, BM, value=1.0)
    zre_p = _pad_to(zre[None, :], 1, BL, value=1.0)
    zim_p = _pad_to(zim[None, :], 1, BL)
    Mp, Lp = a_p.shape[1], zre_p.shape[1]

    grid = (Mp // BM, Lp // BL)
    ab_spec = pl.BlockSpec((K, BM, N), lambda i, j: (0, i, 0),
                           memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((BM, N), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, BL), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((K, BM, BL), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[ab_spec, ab_spec, cd_spec, cd_spec] + [z_spec] * 2,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((K, Mp, Lp), jnp.float32),
                   jax.ShapeDtypeStruct((K, Mp, Lp), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=(13 + 11 * K) * Mp * N * Lp,
            bytes_accessed=(2 * K * Mp * N + 2 * Mp * N + 2 * Lp
                            + 2 * K * Mp * Lp) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(a_p, b_p, c_p, d_p, zre_p, zim_p)
    return out_re[:, :M, :L], out_im[:, :M, :L]


def _cauchy_quad_fwd(a, b, c, d, zre, zim):
    out = _cauchy_quad_fwd_impl(a, b, c, d, zre, zim)
    return out, (a, b, c, d, zre, zim)


def _cauchy_quad_bwd(res, g):
    a, b, c, d, zre, zim = res
    gre, gim = g
    K, M, N = a.shape
    L = zre.shape[0]
    if L > MAX_BWD_L:
        # VMEM-bounded fallback: differentiate the XLA formulation
        raise NotImplementedError  # handled by wrapper choosing XLA path
    a_p = _pad_to(a, 1, BM_BWD)
    b_p = _pad_to(b, 1, BM_BWD)
    c_p = _pad_to(c, 0, BM_BWD)
    d_p = _pad_to(d, 0, BM_BWD, value=1.0)
    # pad L so lanes align; padded g is 0 so reductions are unaffected
    zre_p = _pad_to(zre[None, :], 1, 128, value=1.0)
    zim_p = _pad_to(zim[None, :], 1, 128)
    gre_p = _pad_to(_pad_to(gre, 1, BM_BWD), 2, 128)
    gim_p = _pad_to(_pad_to(gim, 1, BM_BWD), 2, 128)
    _, Mp, Lp = gre_p.shape

    grid = (Mp // BM_BWD,)
    ab_spec = pl.BlockSpec((K, BM_BWD, N), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((BM_BWD, N), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((K, BM_BWD, Lp), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[ab_spec, ab_spec, cd_spec, cd_spec]
        + [z_spec] * 2 + [g_spec] * 2,
        out_specs=(ab_spec, ab_spec, cd_spec, cd_spec),
        out_shape=(jax.ShapeDtypeStruct((K, Mp, N), jnp.float32),
                   jax.ShapeDtypeStruct((K, Mp, N), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, N), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, N), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=(20 + 40 * K) * Mp * N * Lp,
            bytes_accessed=(4 * K * Mp * N + 2 * Lp
                            + 2 * K * Mp * Lp) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(a_p, b_p, c_p, d_p, zre_p, zim_p, gre_p, gim_p)
    da, db = outs[0][:, :M], outs[1][:, :M]
    dc, dd = outs[2][:M], outs[3][:M]
    return da, db, dc, dd, None, None


_cauchy_quad.defvjp(_cauchy_quad_fwd, _cauchy_quad_bwd)


def cauchy_sym_pallas(v: jnp.ndarray, z: jnp.ndarray, w: jnp.ndarray
                      ) -> jnp.ndarray:
    """Drop-in for ops.cauchy.cauchy_sym using the fused Pallas kernels.

    v: (..., H, N) complex64; z: (L,) complex64; w: (H, N) complex64.
    Returns (..., H, L) complex64.  Differentiable wrt v and w.

    The leading dims of v are carried as a component axis K whose
    denominator work (from w alone) is shared inside the kernel — for
    the S4 NPLR evaluation K = (1+r)(c+r) components all share one w.
    """
    comp_shape = v.shape[:-2]
    H, N = v.shape[-2:]
    L = z.shape[0]
    assert w.shape == (H, N), (w.shape, v.shape)

    # Real coefficients (differentiable jnp ops -> grads reach v, w).
    a = 2.0 * v.real
    b = -2.0 * (v.real * w.real + v.imag * w.imag)
    cw = -2.0 * w.real
    dw = w.real ** 2 + w.imag ** 2

    K = max(int(np.prod(comp_shape)), 1)
    out_re, out_im = _cauchy_quad(
        a.reshape(K, H, N), b.reshape(K, H, N), cw, dw,
        z.real.astype(jnp.float32), z.imag.astype(jnp.float32))
    out = jax.lax.complex(out_re, out_im).reshape(comp_shape + (H, L))
    return out
