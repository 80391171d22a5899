"""DiffWave WaveNet backbone (eps-prediction network) in Flax.

Architecture parity with the reference (models/wavenet.py:45-220):

  init 1x1 conv + ReLU
  -> num_res_layers dilated-conv residual blocks (dilation 2^(n % cycle)):
       h = x + fc_t(embed)[..., None]
       h = dilated_conv_k3(h) -> 2C channels
       [conditional] h += mel_conv(upsampled mel)
       out = tanh(h[:, :C]) * sigmoid(h[:, C:])
       res = 1x1(out); skip = 1x1(out)
       block output: (x + res) * sqrt(0.5)
  -> sum of skips * sqrt(1 / n_layers)
  -> 1x1 conv -> ReLU -> zero-init 1x1 conv

The diffusion-step embedding goes through two shared swish-FC layers
(fc_t1/fc_t2, ref wavenet.py:139-141) and a per-block FC (fc_t).

TPU notes: all 1x1 convs lower to MXU matmuls; the k=3 dilated conv uses an
NCH ``lax.conv_general_dilated``.  Activations run in ``dtype`` (bf16 by
default on the fast path) with f32 accumulation; the residual/skip sums stay
in ``dtype``; the final output is cast to f32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import WNConv1d, ZeroConv1d, TorchLinear, swish
from ..ops.mel_upsample import MelUpsampler
from .embedding import diffusion_step_embedding

Dtype = Any


class ResidualBlock(nn.Module):
    res_channels: int
    skip_channels: int
    dilation: int = 1
    diffusion_step_embed_dim_out: int = 512
    unconditional: bool = True
    mel_upsample: Sequence[int] = (16, 16)
    train: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, step_embed: jnp.ndarray,
                 mel_spec: Optional[jnp.ndarray] = None):
        C = self.res_channels
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        part_t = TorchLinear(self.diffusion_step_embed_dim_out, C,
                             name="fc_t", **kw)(step_embed)  # (B, C)
        h = x + part_t[:, :, None]

        # shifted-matmul dilated conv in TRAINING only: +47% train
        # steps/s on v5e, but slower than XLA's conv in eval sampling
        # (see ops/conv.SHIFT_MM for the measured A/B)
        h = WNConv1d(C, 2 * C, kernel_size=3, dilation=self.dilation,
                     name="dilated_conv",
                     shift_mm=("auto" if self.train else False),
                     **kw)(h)

        if mel_spec is not None:
            assert not self.unconditional
            mel = MelUpsampler(self.mel_upsample, name="mel_upsampler",
                               **kw)(mel_spec, h.shape[-1])
            mel = WNConv1d(mel.shape[1], 2 * C, kernel_size=1,
                           name="mel_conv", **kw)(mel)
            h = h + mel

        res_conv = WNConv1d(C, C, kernel_size=1, name="res_conv", **kw)
        skip_conv = WNConv1d(C, self.skip_channels, kernel_size=1,
                             name="skip_conv", **kw)

        L = h.shape[-1]
        from ..ops import wavenet_gate
        if (wavenet_gate.FUSED_TAIL["enabled"] and not self.train
                and not self.is_initializing()
                and jax.default_backend() in ("tpu", "axon")
                and L % 128 == 0):
            # Fused gate + res/skip tail (ops/wavenet_gate).  OFF by
            # default: measured SLOWER than XLA end-to-end on v5e
            # (81.6 vs 70.1 ms/step, wnet_h256_d36 B8 T=200 — XLA's own
            # gate+1x1 fusion wins at this op mix; see BASELINE.md).
            # Kept as an opt-in for future tile-size revisits.
            from ..ops import fftconv_pallas
            return wavenet_gate.gate_res_skip(
                h, x,
                res_conv.effective_weight()[:, :, 0], res_conv.b,
                skip_conv.effective_weight()[:, :, 0], skip_conv.b,
                fast=fftconv_pallas.FAST["enabled"])

        out = jnp.tanh(h[:, :C, :]) * jax.nn.sigmoid(h[:, C:, :])
        res = res_conv(out)
        skip = skip_conv(out)
        return ((x + res) * jnp.asarray(math.sqrt(0.5), self.dtype)), skip


class WaveNet(nn.Module):
    """eps_theta((x_t, t), mel) with the reference's constructor surface."""

    in_channels: int = 1
    res_channels: int = 256
    skip_channels: int = 128
    out_channels: int = 1
    num_res_layers: int = 30
    dilation_cycle: int = 10
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512
    unconditional: bool = True
    mel_upsample: Sequence[int] = (16, 16)
    remat: bool = False   # jax.checkpoint each residual block
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray, diffusion_steps: jnp.ndarray,
                 mel_spec: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = audio.astype(self.dtype)

        x = WNConv1d(self.in_channels, self.res_channels, kernel_size=1,
                     name="init_conv", **kw)(x)
        x = jax.nn.relu(x)

        # Shared diffusion-step embedding MLP (ref wavenet.py:139-155).
        embed = diffusion_step_embedding(
            diffusion_steps, self.diffusion_step_embed_dim_in,
            dtype=jnp.float32).astype(self.dtype)
        embed = swish(TorchLinear(self.diffusion_step_embed_dim_in,
                                  self.diffusion_step_embed_dim_mid,
                                  name="fc_t1", **kw)(embed))
        embed = swish(TorchLinear(self.diffusion_step_embed_dim_mid,
                                  self.diffusion_step_embed_dim_out,
                                  name="fc_t2", **kw)(embed))

        skip_sum = jnp.zeros(
            (x.shape[0], self.skip_channels, x.shape[2]), self.dtype)
        h = x
        Block = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        for n in range(self.num_res_layers):
            h, skip = Block(
                res_channels=self.res_channels,
                skip_channels=self.skip_channels,
                dilation=2 ** (n % self.dilation_cycle),
                diffusion_step_embed_dim_out=self.diffusion_step_embed_dim_out,
                unconditional=self.unconditional,
                mel_upsample=self.mel_upsample,
                train=train,
                name=f"block{n}", **kw,
            )(h, embed, mel_spec)
            skip_sum = skip_sum + skip
        x = skip_sum * jnp.asarray(math.sqrt(1.0 / self.num_res_layers),
                                   self.dtype)

        x = WNConv1d(self.skip_channels, self.skip_channels, kernel_size=1,
                     name="final_conv1", **kw)(x)
        x = jax.nn.relu(x)
        x = ZeroConv1d(self.skip_channels, self.out_channels,
                       name="final_conv2", **kw)(x)
        return x.astype(jnp.float32)
