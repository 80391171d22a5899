"""Mel-spectrogram upsampler: two weight-normalized ConvTranspose2d stages.

Parity with the reference conditioner (models/wavenet.py:64-71 and
models/sashimi.py:138-146): per-block ``ConvTranspose2d(1, 1, (3, 2s),
padding=(1, s//2), stride=(1, s))`` with leaky_relu(0.4) after each stage,
followed by truncation to the audio length and a 1x1 conv from 80 mel bands
onto the gate pre-activation.

torch's ConvTranspose2d is implemented here as an input-dilated regular
convolution with a spatially flipped kernel — the standard transpose-conv
identity — via ``lax.conv_general_dilated`` with ``lhs_dilation``.

Init parity: weight_norm + kaiming_normal_ in the reference is effectively the
torch ConvTranspose2d default init (see ops/conv.py docstring); for a
ConvTranspose2d weight (in, out, kh, kw), torch computes fan_in as
``out * kh * kw``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import torch_uniform_init

Dtype = Any


class WNConvTranspose2dMel(nn.Module):
    """One (3, 2s) transpose-conv stage on a (B, M, L) mel 'image' (1 channel)."""

    s: int  # time-axis upsampling factor
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        kh, kw = 3, 2 * self.s
        fan_in = 1 * kh * kw  # out_channels * kh * kw for ConvTranspose2d
        v = self.param("v", torch_uniform_init(fan_in), (1, 1, kh, kw),
                       self.param_dtype)
        g = self.param(
            "g",
            lambda rng, shape: jnp.sqrt(jnp.sum(jnp.square(v))).reshape(1)
            .astype(self.param_dtype),
            (1,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v)))
        w = (g[0] / norm) * v  # (in=1, out=1, kh, kw)
        b = self.param("b", torch_uniform_init(fan_in), (1,), self.param_dtype)

        # ConvTranspose == conv with lhs dilated by stride, kernel flipped,
        # padding (k - 1 - p) per spatial dim.
        w_flip = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # (O, I, kh, kw)
        ph, pw = 1, self.s // 2
        x = mel[:, None, :, :]  # (B, 1, M, L)
        # NOTE: no preferred_element_type here — with bf16 operands and an
        # f32-preferred output, the conv's VJP builds a transpose conv of
        # the f32 cotangent against the bf16 weight, which lax rejects
        # (mixed dtypes).  bf16 convs accumulate in f32 on the TPU MXU
        # regardless; the bias add below is explicit f32.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_flip.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=(1, self.s),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        y = y.astype(jnp.float32) + b.astype(jnp.float32)[None, :, None,
                                                          None]
        return y.astype(self.dtype)[:, 0, :, :]  # (B, M, s*L)


class MelUpsampler(nn.Module):
    """Two transpose-conv stages with leaky_relu(0.4), truncated to length L."""

    factors: Sequence[int]  # e.g. (16, 16); product == hop_length
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, out_length: int) -> jnp.ndarray:
        x = mel
        for i, s in enumerate(self.factors):
            x = WNConvTranspose2dMel(s=s, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"upsample{i}")(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.4)
        assert x.shape[-1] >= out_length, (
            f"upsampled mel length {x.shape[-1]} < audio length {out_length}")
        return x[:, :, :out_length]
