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

The eval wrappers (mix_glu_res / ln_ff_res) have no VJP; the training
path uses the *_train wrappers whose custom VJPs run HAND-WRITTEN fused
backward kernels (see the training section below).  On non-TPU backends
the pure-XLA reference implementations run instead (same math, testable
vs the module path on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fftconv2 import _gelu_exact, _gelu_fast, _interpret

# Auto batch-interleave factor for the eval ln_ff kernel (see ln_ff_res
# ``bb``); sweepable via scripts/chmix_bb_sweep.py.
DEFAULT_BB = 1


def _choose_st(S: int, H: int, Rc: int, bb: int = 1) -> int:
    """Rows per program: keep N = S_t*Rc >= 1024 where possible while the
    f32 working set (x tile + 2H intermediate) stays well under VMEM.
    ``bb`` > 1 interleaves that many independent batch chains per program
    (same ILP trick as ops/fftconv2 lay.BB), so the per-chain row budget
    shrinks to keep the total frame constant."""
    st = S
    floor = max(8 // bb, 1)
    # budget ~6 MB of f32 across the ~4 live (S_t, 2H, Rc)-class tensors
    while st > floor and st * H * Rc * 4 * 6 * bb > 6 * 2 ** 20:
        st //= 2
    return st


def _choose_st_bwd(S: int, H: int, F: int, Rc: int) -> int:
    """Backward-kernel tile rows: the live set is larger (z, gelu(z), dh,
    dz at width F plus ~6 H-wide tensors, all f32), and Mosaic's frame
    must stay under the 16 MB scoped-vmem limit.  The frame also carries
    a batch-row-INDEPENDENT fixed cost — w1/w2t/w1t plus the dw1/dw2
    VMEM accumulators, ~5 F*H f32 tensors (10 MB at tier-3 H=512/F=1024)
    — which must come out of the row budget: ignoring it put the tier-3
    kernel 444 KB over the limit inside the B32 train step (measured
    2026-08-18, "scoped allocation 16.43M > 16.00M")."""
    per_st = (4 * F + 6 * H) * Rc * 4
    fixed = 5 * F * H * 4
    budget = max(11 * 2 ** 20 - fixed, per_st)
    st = S
    while st > 1 and st * per_st > budget:
        st //= 2
    return st


# ---------------------------------------------------------------------------
# out = res + GLU(W @ y + b)


def _bmm(w, x, tmp):
    """(O, H) @ (S_t, H, Rc) -> (S_t, O, Rc): weight broadcast over the
    row batch; contraction over the channel (sublane) dim, no relayout.
    Strict mode (tmp == f32) pins HIGHEST precision — DEFAULT would still
    run bf16 MXU passes on f32 operands.

    Rc > 128 is split into 128-lane chunks: Mosaic's vector-layout pass
    crashes ("limits[i] <= dim(i)") on this batched dot_general whenever
    the rhs minor dim spans multiple lane tiles (hit by the Rc=256
    long-L layout family; chunks are tile-aligned so the split is free).
    """
    St = x.shape[0]
    prec = (jax.lax.Precision.DEFAULT if tmp == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    wb = jnp.broadcast_to(w.astype(tmp), (St,) + w.shape)
    xc = x.astype(tmp)
    Rc = x.shape[2]

    def one(sl):
        return jax.lax.dot_general(wb, sl, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    if Rc <= 128:
        return one(xc)
    return jnp.concatenate(
        [one(xc[:, :, i:i + 128]) for i in range(0, Rc, 128)], axis=2)


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


def _ff_kernel(x_ref, *refs, fast: bool, has_skip: bool, emit_stats: bool,
               bb: int = 1):
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    refs = list(refs)
    skip_ref = refs.pop(0) if has_skip else None
    w1_ref, b1_ref, w2_ref, b2_ref, ms_ref, o_ref = refs[:6]
    mean_ref, var_ref = (refs[6], refs[7]) if emit_stats else (None, None)
    m = ms_ref[0, 0]
    s = ms_ref[1, 0]
    w1 = w1_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]
    # bb > 1 unrolls independent per-batch-item chains so the scheduler
    # can overlap one chain's VPU stages (LN stats, GELU) with another's
    # MXU matmuls (same ILP trick as ops/fftconv2 lay.BB)
    for i in range(bb):
        xt = x_ref[i].astype(f32)                    # (S_t, H, Rc)
        mean = jnp.mean(xt, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xt), axis=1, keepdims=True) - mean * mean
        # TransposedLN: (s / std) * (x - mean + m), population std, no eps
        xn = (s * jax.lax.rsqrt(var)) * (xt - mean + m)
        z = _bmm(w1, xn, tmp)                        # (S_t, 2H, Rc)
        z = z + b1[None]
        z = _gelu_fast(z) if fast else _gelu_exact(z)
        o = _bmm(w2, z, tmp)                         # (S_t, H, Rc)
        o = o + b2[None]
        out = xt + o
        if has_skip:
            out = out + skip_ref[i].astype(f32)      # fused UNet skip add
        o_ref[i] = out.astype(o_ref.dtype)
        if emit_stats:
            # channel stats of the OUTPUT: the next block's norm1 prologue
            # consumes these, so its XLA stats reduction disappears
            mo = jnp.mean(out, axis=1)               # (S_t, Rc)
            mean_ref[i] = mo
            var_ref[i] = jnp.mean(jnp.square(out), axis=1) - mo * mo


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
              emit_stats: bool = False, bb: Optional[int] = None):
    """x: (B, S, H, Rc) -> x + ff2(gelu(ff1(TLN(x)))) [+ skip], one HBM
    pass.  With ``emit_stats`` also returns (mean, var) of the output
    over the channel dim — the next block's norm1 prologue input, so the
    per-block XLA stats reduction disappears (stats ride the scan carry).

    Fuses the DiffWave block's norm2 + feed-forward + residual branch
    (reference models/sashimi.py:116-123: LayerNorm + ff Conv pair) and
    the UNet skip add (reference models/sashimi.py:300-307).
    w1: (F, H); w2: (H, F); m, s: TransposedLN scalars, shape (1,).
    ``bb``: independent batch chains per program (None = auto).
    """
    if _interpret():
        return ln_ff_res_ref(x, m, s, w1, b1, w2, b2, skip, emit_stats)
    B, S, H, Rc = x.shape
    F = w1.shape[0]
    if bb is None:
        bb = DEFAULT_BB
    if B % bb != 0:
        bb = 1
    St = _choose_st(S, max(H, F), Rc, bb)
    assert S % St == 0, (S, St)
    b1c = b1.astype(jnp.float32).reshape(-1, 1)
    b2c = b2.astype(jnp.float32).reshape(-1, 1)
    ms = jnp.stack([m.astype(jnp.float32).reshape(()),
                    s.astype(jnp.float32).reshape(())]).reshape(2, 1)
    io_spec = pl.BlockSpec((bb, St, H, Rc), lambda gb, ss: (gb, ss, 0, 0),
                           memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((bb, St, Rc), lambda gb, ss: (gb, ss, 0),
                           memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda gb, ss: (0,) * a.ndim,
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
                          emit_stats=emit_stats, bb=bb),
        grid=(B // bb, S // St),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * Rc * 2 * H * F,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size * F // H),
    )(*ins)
    return out


# ---------------------------------------------------------------------------
# Training path: the same fused forwards with HAND-WRITTEN backward kernels
# (jax.custom_vjp).  The XLA autodiff of the unfused formulation
# materializes every intermediate (z, gelu(z), LN stats chains) in HBM
# twice (remat recompute + backward); these kernels recompute them in
# VMEM from the saved block INPUT only — the same memory discipline as
# the forward.  Weight/bias/scalar grads accumulate across the grid into
# VMEM-resident output tiles (grid iteration on TPU is sequential).
#
# On non-TPU backends the public *_train wrappers fall back to the
# differentiable XLA references (identical math); the kernels themselves
# are covered by dedicated interpret-mode grad tests.


def _gelu_exact_grad(x):
    from .fftconv2 import _erf
    phi = 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))
    pdf = np.float32(1.0 / np.sqrt(2.0 * np.pi)) * jnp.exp(-0.5 * x * x)
    return phi + x * pdf


def _gelu_fast_grad(x):
    from .fftconv2 import _GELU_C
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc
    p = jnp.asarray(_GELU_C[-1], x.dtype)
    for c in _GELU_C[-2::-1]:
        p = p * x2 + jnp.asarray(c, x.dtype)
    pp = jnp.asarray(6.0 * _GELU_C[-1], x.dtype)
    for i in range(5, 0, -1):
        pp = pp * x2 + jnp.asarray(i * _GELU_C[i], x.dtype)
    inner = 0.5 + 2.0 * xc * (p + x2 * pp)
    return jnp.where(x > 4.0, 1.0, jnp.where(x < -4.0, 0.0, inner))


def _bmmc(a, b):
    """Batched (S_t, O, Rc) x (S_t, I, Rc) -> (O, I): contract the Rc
    lanes AND the row batch (weight-gradient contraction)."""
    St = a.shape[0]
    acc = None
    for si in range(St):
        t = jax.lax.dot_general(a[si], b[si], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _splat2(v0, v1):
    """(8, 128) tile carrying two accumulated scalars in rows 0/1."""
    return jnp.concatenate([jnp.full((1, 128), v0, jnp.float32),
                            jnp.full((1, 128), v1, jnp.float32),
                            jnp.zeros((6, 128), jnp.float32)], axis=0)


def _ff_bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2t_ref, w1t_ref, ms_ref,
                   dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dms_ref, *,
                   fast: bool):
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    xt = x_ref[0].astype(f32)                        # (S_t, H, Rc)
    gt = g_ref[0].astype(f32)
    m = ms_ref[0, 0]
    s = ms_ref[1, 0]
    mean = jnp.mean(xt, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xt), axis=1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var)
    xc = xt - mean
    r = s * rstd
    xn = r * (xc + m)
    z = _bmm(w1_ref[...], xn, tmp) + b1_ref[...][None]
    hact = _gelu_fast(z) if fast else _gelu_exact(z)
    dh = _bmm(w2t_ref[...], gt, tmp)                 # (S_t, F, Rc)
    dz = (_gelu_fast_grad(z) if fast else _gelu_exact_grad(z)) * dh
    dxn = _bmm(w1t_ref[...], dz, tmp)                # (S_t, H, Rc)
    S1 = jnp.mean(dxn, axis=1, keepdims=True)
    S2 = jnp.mean(dxn * (xc + m), axis=1, keepdims=True)
    dx = gt + r * (dxn - S1) - (r * rstd * rstd) * xc * S2
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dw1 = _bmmc(dz, xn)                              # (F, H)
    dw2 = _bmmc(gt, hact)                            # (H, F)
    db1 = jnp.sum(dz, axis=(0, 2))[:, None]          # (F, 1)
    db2 = jnp.sum(gt, axis=(0, 2))[:, None]          # (H, 1)
    dm = jnp.sum(dxn * r)
    ds = jnp.sum(dxn * rstd * (xc + m))
    dms = _splat2(dm, ds)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dms_ref[...] = dms

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        dms_ref[...] += dms


def _glu_bwd_kernel(y_ref, g_ref, w_ref, b_ref, wt_ref,
                    dy_ref, dw_ref, db_ref, *, fast: bool):
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    yt = y_ref[0].astype(f32)                        # (S_t, H, Rc)
    gt = g_ref[0].astype(f32)
    H = yt.shape[1]
    z = _bmm(w_ref[...], yt, tmp) + b_ref[...][None]
    a, gate = z[:, :H], z[:, H:]
    sig = jax.nn.sigmoid(gate)
    da = gt * sig
    dgate = gt * a * sig * (1.0 - sig)
    dz = jnp.concatenate([da, dgate], axis=1)        # (S_t, 2H, Rc)
    dy = _bmm(wt_ref[...], dz, tmp)                  # (S_t, H, Rc)
    dy_ref[0] = dy.astype(dy_ref.dtype)

    dw = _bmmc(dz, yt)                               # (2H, H)
    db = jnp.sum(dz, axis=(0, 2))[:, None]           # (2H, 1)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = dw
        db_ref[...] = db

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw_ref[...] += dw
        db_ref[...] += db


def _grid_specs(B, S, St, H, Rc):
    io = pl.BlockSpec((1, St, H, Rc), lambda bb, ss: (bb, ss, 0, 0),
                      memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda bb, ss: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)
    return io, full


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ff_train(fast, x, m, s, w1, b1, w2, b2):
    out = ln_ff_res(x, m, s, w1, b1, w2, b2, fast)
    return out


def _ff_train_fwd(fast, x, m, s, w1, b1, w2, b2):
    return _ff_train(fast, x, m, s, w1, b1, w2, b2), \
        (x, m, s, w1, b1, w2, b2)


def _ff_train_bwd(fast, res, g):
    x, m, s, w1, b1, w2, b2 = res
    B, S, H, Rc = x.shape
    F = w1.shape[0]
    St = _choose_st_bwd(S, H, F, Rc)
    assert S % St == 0
    b1c = b1.astype(jnp.float32).reshape(-1, 1)
    ms = jnp.stack([m.astype(jnp.float32).reshape(()),
                    s.astype(jnp.float32).reshape(())]).reshape(2, 1)
    w2t = w2.T                                       # (F, H)
    w1t = w1.T                                       # (H, F)
    io, full = _grid_specs(B, S, St, H, Rc)
    dx, dw1, db1, dw2, db2, dms = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, fast=fast),
        grid=(B, S // St),
        in_specs=[io, io, full(w1), full(b1c), full(w2t), full(w1t),
                  full(ms)],
        out_specs=[io, full(w1), full(b1c), full(w2), full(jnp.zeros(
            (H, 1))), full(jnp.zeros((8, 128)))],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((F, H), jnp.float32),
                   jax.ShapeDtypeStruct((F, 1), jnp.float32),
                   jax.ShapeDtypeStruct((H, F), jnp.float32),
                   jax.ShapeDtypeStruct((H, 1), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        interpret=_interpret(),
    )(x, g.astype(x.dtype), w1, b1c, w2t, w1t, ms)
    dm = dms[0, 0].reshape(1).astype(m.dtype)
    ds = dms[1, 0].reshape(1).astype(s.dtype)
    return (dx, dm, ds, dw1.astype(w1.dtype), db1[:, 0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[:, 0].astype(b2.dtype))


_ff_train.defvjp(_ff_train_fwd, _ff_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ff_train_skip(fast, x, skip, m, s, w1, b1, w2, b2):
    return ln_ff_res(x, m, s, w1, b1, w2, b2, fast, skip=skip)


def _ff_train_skip_fwd(fast, x, skip, m, s, w1, b1, w2, b2):
    return _ff_train_skip(fast, x, skip, m, s, w1, b1, w2, b2), \
        (x, m, s, w1, b1, w2, b2)


def _ff_train_skip_bwd(fast, res, g):
    dx, dm, ds, dw1, db1, dw2, db2 = _ff_train_bwd(fast, res, g)
    return (dx, g, dm, ds, dw1, db1, dw2, db2)


_ff_train_skip.defvjp(_ff_train_skip_fwd, _ff_train_skip_bwd)


def ln_ff_res_train(x, m, s, w1, b1, w2, b2, fast=True, skip=None):
    """Differentiable fused LN + FF + residual (+ skip): fused forward
    kernel plus a hand-written fused backward kernel (weight grads
    accumulate over the batch grid in VMEM).  Falls back to the XLA
    reference off-TPU."""
    if _interpret():
        return ln_ff_res_ref(x, m, s, w1, b1, w2, b2, skip)
    if skip is None:
        return _ff_train(fast, x, m, s, w1, b1, w2, b2)
    return _ff_train_skip(fast, x, skip, m, s, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _glu_train(fast, y, res, w, b):
    return mix_glu_res(y, res, w, b, fast)


def _glu_train_fwd(fast, y, res, w, b):
    return _glu_train(fast, y, res, w, b), (y, w, b)


def _glu_train_bwd(fast, resids, g):
    y, w, b = resids
    B, S, H, Rc = y.shape
    St = _choose_st_bwd(S, H, 2 * H, Rc)
    assert S % St == 0
    b2 = b.astype(jnp.float32).reshape(-1, 1)
    wt = w.T                                         # (H, 2H)
    io, full = _grid_specs(B, S, St, H, Rc)
    dy, dw, db = pl.pallas_call(
        functools.partial(_glu_bwd_kernel, fast=fast),
        grid=(B, S // St),
        in_specs=[io, io, full(w), full(b2), full(wt)],
        out_specs=[io, full(w), full(b2)],
        out_shape=[jax.ShapeDtypeStruct(y.shape, y.dtype),
                   jax.ShapeDtypeStruct(w.shape, jnp.float32),
                   jax.ShapeDtypeStruct((2 * H, 1), jnp.float32)],
        interpret=_interpret(),
    )(y, g.astype(y.dtype), w, b2, wt)
    return (dy, g, dw.astype(w.dtype), db[:, 0].astype(b.dtype))


_glu_train.defvjp(_glu_train_fwd, _glu_train_bwd)


def mix_glu_res_train(y, res, w, b, fast=True):
    """Differentiable fused output-linear + GLU + residual."""
    if _interpret():
        return glu_res_ref(y, res, w, b)
    return _glu_train(fast, y, res, w, b)
