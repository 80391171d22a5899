"""Conv/linear primitives in NCL layout with torch-parity initialization.

The reference wraps every conv in ``nn.utils.weight_norm`` and then calls
``kaiming_normal_`` on the materialized weight (reference: models/wavenet.py:
16-26).  In torch that second call is a silent no-op: weight_norm's forward
pre-hook recomputes ``W = g * v / ||v||`` from the *original* default-init
``v`` on every forward, discarding the kaiming values.  The effective
parameterization the reference actually trains with is therefore:

    v ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))   (torch Conv1d default init)
    g = ||v||_2 per output channel
    W = g * v / ||v||   (== v at init)
    b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))

We reproduce exactly that: a weight-normalized conv whose ``v`` uses the torch
default uniform init and whose ``g`` starts at the per-row norm of ``v``.

All convs here take activations shaped (B, C, L) — the reference layout, which
is also FFT-native for the S4 path.  1x1 convs lower to a single MXU matmul;
k=3 dilated convs use ``lax.conv_general_dilated`` with NCH dimension numbers.
Matmul accumulation is always f32 (``preferred_element_type``) regardless of
the activation dtype (bf16 on the fast path).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bshape(ndim: int):
    """Per-channel bias broadcast shape: channel is dim 1 for flat (B, C, L)
    activations, dim 2 for the compact (B, S, C, Rc) layout (ops/fftconv2)."""
    return (1, 1, -1, 1) if ndim == 4 else (1, -1) + (1,) * (ndim - 2)


def torch_uniform_init(fan_in: int) -> Callable:
    """torch's default kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d on (B, C, L) activations.

    Equivalent to the reference ``Conv`` module (models/wavenet.py:16-26,
    models/sashimi.py:84-93): 'same' padding of ``dilation * (k - 1) // 2``.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32        # activation/compute dtype
    param_dtype: Dtype = jnp.float32
    shift_mm: Any = "auto"            # see conv1d_ncl / SHIFT_MM

    def setup(self):
        fan_in = self.in_channels * self.kernel_size
        self.v = self.param(
            "v", torch_uniform_init(fan_in),
            (self.out_channels, self.in_channels, self.kernel_size),
            self.param_dtype)
        self.g = self.param(
            "g",
            lambda rng, shape: jnp.sqrt(jnp.sum(
                jnp.square(self.v), axis=(1, 2))).astype(self.param_dtype),
            (self.out_channels,))
        if self.use_bias:
            self.b = self.param("b", torch_uniform_init(fan_in),
                                (self.out_channels,), self.param_dtype)

    def effective_weight(self) -> jnp.ndarray:
        """Materialized weight-normed W = g * v / ||v||, shape (O, I, K).
        Exposed so fused kernels (ops/chmix) can consume the weights
        without routing activations through this module."""
        norm = jnp.sqrt(jnp.sum(jnp.square(self.v), axis=(1, 2),
                                keepdims=True))
        return (self.g[:, None, None] / norm) * self.v

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.effective_weight()
        y = conv1d_ncl(x.astype(self.dtype), w.astype(self.dtype),
                       dilation=self.dilation, shift_mm=self.shift_mm)
        if self.use_bias:
            y = y + self.b.astype(self.dtype).reshape(_bshape(x.ndim))
        return y


class ZeroConv1d(nn.Module):
    """1x1 conv with zero-initialized weight and bias (ref wavenet.py:31-40)."""

    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w", nn.initializers.zeros,
                       (self.out_channels, self.in_channels), self.param_dtype)
        b = self.param("b", nn.initializers.zeros,
                       (self.out_channels,), self.param_dtype)
        eq = "bscr,oc->bsor" if x.ndim == 4 else "bc...,oc->bo..."
        y = jnp.einsum(eq, x.astype(self.dtype), w.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        b = b.astype(jnp.float32).reshape(_bshape(x.ndim))
        return (y + b).astype(self.dtype)


class TorchLinear(nn.Module):
    """nn.Linear with torch default init (U(+-1/sqrt(fan_in)))."""

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w", torch_uniform_init(self.in_features),
                       (self.out_features, self.in_features), self.param_dtype)
        y = jnp.einsum("...i,oi->...o", x.astype(self.dtype),
                       w.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("b", torch_uniform_init(self.in_features),
                           (self.out_features,), self.param_dtype)
            y = y + b.astype(jnp.float32)
        return y.astype(self.dtype)


# Dilated conv as k shifted channel matmuls. Measured on v5e (round 5,
# scripts/wavenet_shiftmm_check.py, within one session, wnet_h256_d36):
# TRAINING 119.5 vs 175.8 ms/step B4 (+47% — the conv VJP is where XLA's
# rhs_dilation lowering starves the MXU; matmul VJPs are clean), but
# EVAL sampling 88.9 vs 65.7 ms/step B8 (XLA fuses the gate epilogue
# into its conv better than into k separate einsums).  So the model
# passes shift_mm per call: train -> "auto" (on for TPU), eval -> False.
# set_shift_mm(True/False) force-overrides both for A/B scripts.
SHIFT_MM = {"enabled": None}


def set_shift_mm(enabled) -> None:
    SHIFT_MM["enabled"] = enabled


def _resolve_shift_mm(local) -> bool:
    g = SHIFT_MM["enabled"]
    if g is not None:
        return bool(g)
    if local != "auto":
        return bool(local)
    return jax.default_backend() in ("tpu", "axon")


def _conv1d_shift_mm(x: jnp.ndarray, w: jnp.ndarray, dilation: int,
                     pad: int) -> jnp.ndarray:
    """y[:, o, t] = sum_{j} W[o, :, j] . x[:, :, t + j*d - pad] (zero-pad).

    Same math as the NCH conv_general_dilated call below (torch Conv1d
    'same'-style padding, ref models/wavenet.py:16-26); each tap is one
    MXU contraction over channels at a static lane offset, with the f32
    accumulate + downcast pattern of the k==1 branch.
    """
    k = w.shape[-1]
    L = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad))) if pad else x
    y = None
    for j in range(k):
        term = jnp.einsum("bcl,oc->bol", xp[:, :, j * dilation:
                                            j * dilation + L],
                          w[:, :, j], preferred_element_type=jnp.float32)
        y = term if y is None else y + term
    return y.astype(x.dtype)


def conv1d_ncl(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1,
               stride: int = 1, shift_mm="auto") -> jnp.ndarray:
    """1-D convolution on (B, C, L) with (O, I, K) weights, 'same'-style pad.

    For k == 1 this is a pure channel matmul (one MXU contraction, no conv op).
    ``shift_mm``: "auto" (shifted-matmul path on TPU), True, or False —
    overridden by the module-level :data:`SHIFT_MM` toggle when set.
    """
    k = w.shape[-1]
    if k == 1 and stride == 1:
        # pure channel matmul.  3-dim activations are (B, C, L); 4-dim are
        # the channel-inner compact layout (B, S, C, Rc) of ops/fftconv2.
        if x.ndim == 4:
            y = jnp.einsum("bscr,oc->bsor", x, w[:, :, 0],
                           preferred_element_type=jnp.float32)
        else:
            y = jnp.einsum("bc...,oc->bo...", x, w[:, :, 0],
                           preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    pad = dilation * (k - 1) // 2
    if _resolve_shift_mm(shift_mm) and stride == 1 and x.ndim == 3:
        return _conv1d_shift_mm(x, w, dilation, pad)
    # no preferred_element_type: upcasting the output then downcasting makes
    # the conv BACKWARD see mixed (bf16, f32) operands, which
    # conv_general_dilated rejects; TPU convs accumulate in f32 regardless
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)
