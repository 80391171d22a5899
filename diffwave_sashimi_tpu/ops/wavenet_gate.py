"""Fused WaveNet residual-block tail: gate + res/skip 1x1 convs, one pass.

The DiffWave WaveNet block (reference models/wavenet.py:77-121) computes,
after the dilated conv h (B, 2C, L):

    out  = tanh(h[:, :C]) * sigmoid(h[:, C:])
    res  = (x + W_r @ out + b_r) * sqrt(0.5)
    skip = W_s @ out + b_s

XLA materializes ``out`` to HBM between the gate and the two 1x1 convs
and reads it twice; this kernel keeps the gated activation in VMEM and
emits res and skip in a single read of (h, x) — the dilated conv itself
stays in XLA (it is a dense MXU conv, already near peak).  Eval-only
(no VJP): the training path keeps the XLA formulation.

Layout: channels on sublanes, time on lanes, grid (B, L/Lt) with the
(C, C) and (S, C) weights VMEM-resident across all programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = float(np.sqrt(0.5))

# Opt-in switch consumed by models/wavenet.py: measured SLOWER than the
# plain XLA block on v5e (81.6 vs 70.1 ms/step at wnet_h256_d36 B8 T=200
# — XLA fuses the gate into the conv epilogue and runs the 1x1s at full
# tile sizes, while this kernel's 640-lane grid adds launch overhead).
FUSED_TAIL = {"enabled": False}


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def gate_res_skip_ref(h, x, wr, br, ws, bs):
    """XLA reference (CPU fallback, tests)."""
    C = x.shape[1]
    hf = h.astype(jnp.float32)
    out = jnp.tanh(hf[:, :C]) * jax.nn.sigmoid(hf[:, C:])
    res = jnp.einsum("ck,bkl->bcl", wr.astype(jnp.float32), out,
                     preferred_element_type=jnp.float32)
    res = (x.astype(jnp.float32) + res + br.astype(jnp.float32)[:, None]) \
        * SQRT_HALF
    skip = jnp.einsum("sk,bkl->bsl", ws.astype(jnp.float32), out,
                      preferred_element_type=jnp.float32) \
        + bs.astype(jnp.float32)[:, None]
    return res.astype(x.dtype), skip.astype(x.dtype)


def _kernel(h_ref, x_ref, wr_ref, brc_ref, ws_ref, bsc_ref,
            res_ref, skip_ref, *, C: int, fast: bool):
    f32 = jnp.float32
    tmp = jnp.bfloat16 if fast else f32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    h = h_ref[0].astype(f32)                       # (2C, Lt)
    out = (jnp.tanh(h[:C]) * jax.nn.sigmoid(h[C:])).astype(tmp)

    def mm(w, b):
        return jnp.dot(w[:, :].astype(tmp), out,
                       preferred_element_type=f32, precision=prec) + b[:, :]

    res = (x_ref[0].astype(f32) + mm(wr_ref, brc_ref)) * SQRT_HALF
    res_ref[0] = res.astype(res_ref.dtype)
    skip_ref[0] = mm(ws_ref, bsc_ref).astype(skip_ref.dtype)


def _pick_lt(L: int, target: int = 2048) -> int:
    """Largest multiple-of-128 divisor of L that is <= target (the Mosaic
    lane-tile constraint: block lane dims must be 128-divisible or span
    the full array); falls back to the full L."""
    best = None
    for d in range(1, int(np.sqrt(L)) + 1):
        if L % d == 0:
            for c in (d, L // d):
                if c % 128 == 0 and c <= target and (best is None
                                                     or c > best):
                    best = c
    return best if best is not None else L


def gate_res_skip(h: jnp.ndarray, x: jnp.ndarray, wr: jnp.ndarray,
                  br: jnp.ndarray, ws: jnp.ndarray, bs: jnp.ndarray,
                  fast: bool = True):
    """h (B, 2C, L), x (B, C, L) -> (res (B, C, L), skip (B, S, L)).

    Off-TPU this runs the kernel in interpret mode (tests); the model
    only routes here on the TPU backend (models/wavenet.py eval path).
    """
    B, C, L = x.shape
    S = ws.shape[0]
    Lt = _pick_lt(L)
    grid = (B, L // Lt)
    brc = br.astype(jnp.float32).reshape(C, 1)
    bsc = bs.astype(jnp.float32).reshape(S, 1)

    def io(ch):
        return pl.BlockSpec((1, ch, Lt), lambda b, l: (b, 0, l),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda b, l: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    res, skip = pl.pallas_call(
        functools.partial(_kernel, C=C, fast=fast),
        grid=grid,
        in_specs=[io(2 * C), io(C), full(wr), full(brc), full(ws),
                  full(bsc)],
        out_specs=[io(C), io(S)],
        out_shape=[jax.ShapeDtypeStruct((B, C, L), x.dtype),
                   jax.ShapeDtypeStruct((B, S, L), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * C * (C + S),
            bytes_accessed=(h.size + 2 * x.size) * x.dtype.itemsize
            + B * S * L * x.dtype.itemsize,
            transcendentals=h.size),
        interpret=_interpret(),
    )(h, x, wr, brc, ws, bsc)
    return res, skip
