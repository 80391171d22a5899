"""Fused position-wise channel-mixing Pallas kernels for the compact
(B, S, H, Rc) layout (ops/fftconv2).

The sampling step's non-conv time is dominated by HBM passes of the
position-wise channel ops around the S4 convolution (measured on v5e,
scripts/step_ablation.py: FF ~25 ms, GLU ~7 ms, LN ~4 ms of an 84 ms
step at B16/d128).  XLA fuses elementwise chains into matmuls, but each
matmul / LayerNorm boundary still materializes a full activation tensor
in HBM.  These kernels collapse each residual branch to exactly one HBM
read and one write:

  mix_glu_res:  out = res + GLU(W @ y + b)           (S4 output linear)
  ln_ff_res:    out = x + W2 @ gelu(W1 @ TLN(x) + b1) + b2   (block FF)

Both contract the channel axis H, which sits in the middle (sublane)
dimension of the compact layout.  Per program the matmul runs as a
BATCHED dot_general over the S_t rows — (O, H) @ (H, Rc) per row with
the weight broadcast across the batch dim — because any in-kernel
swapaxes to build a flat (H, S_t*Rc) operand costs more than the whole
kernel (measured ~1 ms for the shuffle alone at tier-1 shapes vs
0.39 ms for the full batched-matmul kernel; scripts/chmix_variants.py).
Weights stay VMEM-resident across the whole grid.

TLN is the scalar-affine channel LayerNorm of models/sashimi.TransposedLN
(reference models/sashimi.py:32-45 TransposedLN with learnable scalar
m, s); GLU matches flax/torch glu over the channel dim (reference
models/s4.py:163-177 LinearActivation postact); gelu is the exact-erf
form (A&S 7.1.26 rational erf — Pallas TPU has no erf primitive).

Eval-path only (no VJP): the training path keeps the differentiable XLA
formulation in models/.  On non-TPU backends the pure-XLA reference
implementations below run instead (same math, testable vs the module
path on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fftconv2 import _gelu_exact, _gelu_fast, _interpret


def _choose_st(S: int, H: int, Rc: int) -> int:
    """Rows per program: keep N = S_t*Rc >= 1024 where possible while the
    f32 working set (x tile + 2H intermediate) stays well under VMEM."""
    st = S
    # budget ~6 MB of f32 across the ~4 live (S_t, 2H, Rc)-class tensors
    while st > 8 and st * H * Rc * 4 * 6 > 6 * 2 ** 20:
        st //= 2
    return st


# ---------------------------------------------------------------------------
# out = res + GLU(W @ y + b)


def _bmm(w, x, tmp):
    """(O, H) @ (S_t, H, Rc) -> (S_t, O, Rc): weight broadcast over the
    row batch; contraction over the channel (sublane) dim, no relayout."""
    St = x.shape[0]
    wb = jnp.broadcast_to(w.astype(tmp), (St,) + w.shape)
    return jax.lax.dot_general(wb, x.astype(tmp),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _glu_kernel(y_ref, r_ref, w_ref, b_ref, o_ref, *, fast: bool):
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    yt = y_ref[0]                                   # (S_t, H, Rc)
    H = yt.shape[1]
    z = _bmm(w_ref[...], yt, tmp)                   # (S_t, 2H, Rc)
    z = z + b_ref[...][None]                        # b: (2H, 1)
    a, g = z[:, :H], z[:, H:]
    o = a * jax.nn.sigmoid(g)
    o_ref[0] = (r_ref[0].astype(f32) + o).astype(o_ref.dtype)


def glu_res_ref(y, res, w, b):
    """XLA reference: res + GLU over channel dim of (w @ y + b)."""
    z = jnp.einsum("bshr,oh->bsor", y.astype(jnp.float32),
                   w.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    z = z + b.astype(jnp.float32)[None, None, :, None]
    H = y.shape[2]
    a, g = z[:, :, :H], z[:, :, H:]
    return (res.astype(jnp.float32)
            + a * jax.nn.sigmoid(g)).astype(res.dtype)


def mix_glu_res(y: jnp.ndarray, res: jnp.ndarray, w: jnp.ndarray,
                b: jnp.ndarray, fast: bool = True) -> jnp.ndarray:
    """y, res: (B, S, H, Rc); w: (2H, H); b: (2H,) -> res + GLU(w@y + b).

    Fuses the S4 output linear + GLU postact + the DiffWave block residual
    add (reference models/s4.py:1427-1437 + models/sashimi.py:116-123)
    into one pass over the activations.
    """
    if _interpret():
        return glu_res_ref(y, res, w, b)
    B, S, H, Rc = y.shape
    St = _choose_st(S, H, Rc)
    assert S % St == 0, (S, St)
    b2 = b.astype(jnp.float32).reshape(-1, 1)
    io_spec = pl.BlockSpec((1, St, H, Rc), lambda bb, ss: (bb, ss, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_glu_kernel, fast=fast),
        grid=(B, S // St),
        in_specs=[
            io_spec, io_spec,
            pl.BlockSpec(w.shape, lambda bb, ss: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda bb, ss: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(res.shape, res.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * Rc * 2 * H * H,
            bytes_accessed=3 * y.size * y.dtype.itemsize,
            transcendentals=y.size),
    )(y, res, w, b2)


# ---------------------------------------------------------------------------
# out = x + W2 @ gelu(W1 @ TLN(x) + b1) + b2


def _ff_kernel(x_ref, *refs, fast: bool, has_skip: bool, emit_stats: bool):
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    refs = list(refs)
    skip_ref = refs.pop(0) if has_skip else None
    w1_ref, b1_ref, w2_ref, b2_ref, ms_ref, o_ref = refs[:6]
    mean_ref, var_ref = (refs[6], refs[7]) if emit_stats else (None, None)
    xt = x_ref[0].astype(f32)                       # (S_t, H, Rc)
    m = ms_ref[0, 0]
    s = ms_ref[1, 0]
    mean = jnp.mean(xt, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xt), axis=1, keepdims=True) - mean * mean
    # TransposedLN: (s / std) * (x - mean + m), population std, no eps
    xn = (s * jax.lax.rsqrt(var)) * (xt - mean + m)
    z = _bmm(w1_ref[...], xn, tmp)                   # (S_t, 2H, Rc)
    z = z + b1_ref[...][None]
    z = _gelu_fast(z) if fast else _gelu_exact(z)
    o = _bmm(w2_ref[...], z, tmp)                    # (S_t, H, Rc)
    o = o + b2_ref[...][None]
    out = xt + o
    if has_skip:
        out = out + skip_ref[0].astype(f32)          # fused UNet skip add
    o_ref[0] = out.astype(o_ref.dtype)
    if emit_stats:
        # channel stats of the OUTPUT: the next block's norm1 prologue
        # consumes these, so its XLA stats reduction disappears
        mo = jnp.mean(out, axis=1)                   # (S_t, Rc)
        mean_ref[0] = mo
        var_ref[0] = jnp.mean(jnp.square(out), axis=1) - mo * mo


def ln_ff_res_ref(x, m, s, w1, b1, w2, b2, skip=None, emit_stats=False):
    """XLA reference of the fused LN + FF + residual (+ skip) branch."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=2, keepdims=True)
    std = jnp.sqrt(jnp.var(x32, axis=2, keepdims=True))
    xn = (s.astype(jnp.float32) / std) * (x32 - mean + m.astype(jnp.float32))
    kw = dict(preferred_element_type=jnp.float32)
    z = jnp.einsum("bshr,oh->bsor", xn, w1.astype(jnp.float32), **kw)
    z = jax.nn.gelu(z + b1.astype(jnp.float32)[None, None, :, None],
                    approximate=False)
    o = jnp.einsum("bshr,oh->bsor", z, w2.astype(jnp.float32), **kw)
    o = o + b2.astype(jnp.float32)[None, None, :, None]
    out = x32 + o
    if skip is not None:
        out = out + skip.astype(jnp.float32)
    outc = out.astype(x.dtype)
    if not emit_stats:
        return outc
    mo = jnp.mean(out, axis=2)
    return outc, mo, jnp.mean(jnp.square(out), axis=2) - mo * mo


def ln_ff_res(x: jnp.ndarray, m: jnp.ndarray, s: jnp.ndarray,
              w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              fast: bool = True, skip: Optional[jnp.ndarray] = None,
              emit_stats: bool = False):
    """x: (B, S, H, Rc) -> x + ff2(gelu(ff1(TLN(x)))) [+ skip], one HBM
    pass.  With ``emit_stats`` also returns (mean, var) of the output
    over the channel dim — the next block's norm1 prologue input, so the
    per-block XLA stats reduction disappears (stats ride the scan carry).

    Fuses the DiffWave block's norm2 + feed-forward + residual branch
    (reference models/sashimi.py:116-123: LayerNorm + ff Conv pair) and
    the UNet skip add (reference models/sashimi.py:300-307).
    w1: (F, H); w2: (H, F); m, s: TransposedLN scalars, shape (1,).
    """
    if _interpret():
        return ln_ff_res_ref(x, m, s, w1, b1, w2, b2, skip, emit_stats)
    B, S, H, Rc = x.shape
    F = w1.shape[0]
    St = _choose_st(S, max(H, F), Rc)
    assert S % St == 0, (S, St)
    b1c = b1.astype(jnp.float32).reshape(-1, 1)
    b2c = b2.astype(jnp.float32).reshape(-1, 1)
    ms = jnp.stack([m.astype(jnp.float32).reshape(()),
                    s.astype(jnp.float32).reshape(())]).reshape(2, 1)
    io_spec = pl.BlockSpec((1, St, H, Rc), lambda bb, ss: (bb, ss, 0, 0),
                           memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, St, Rc), lambda bb, ss: (bb, ss, 0),
                           memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda bb, ss: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    ins = [x] + ([skip] if skip is not None else []) \
        + [w1, b1c, w2, b2c, ms]
    in_specs = [io_spec] + ([io_spec] if skip is not None else []) \
        + [full(w1), full(b1c), full(w2), full(b2c), full(ms)]
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    out_specs = [io_spec]
    if emit_stats:
        out_shape += [jax.ShapeDtypeStruct((B, S, Rc), jnp.float32)] * 2
        out_specs += [st_spec, st_spec]
    out = pl.pallas_call(
        functools.partial(_ff_kernel, fast=fast,
                          has_skip=skip is not None,
                          emit_stats=emit_stats),
        grid=(B, S // St),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * Rc * 2 * H * F,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size * F // H),
    )(*ins)
    return out
