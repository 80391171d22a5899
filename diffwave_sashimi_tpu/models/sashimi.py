"""SaShiMi backbone: S4-based UNet eps-prediction network.

Architecture parity with the reference (models/sashimi.py:188-327):

  init 1x1 conv + ReLU
  -> down stages: per pool factor p, [n_layers DiffWaveBlocks if unet] then
     DownPool (reshape (B,H,L) -> (B,H*p,L/p) + 1x1 conv to H*expand)
  -> center: n_layers blocks (+ center skip)
  -> up stages: UpPool + n_layers blocks, with UNet skip connections from the
     ``outputs`` stack
  -> TransposedLN -> 1x1 conv -> ReLU -> zero-init 1x1 conv

DiffWaveBlock (ref models/sashimi.py:113-184):
  y = norm1(x); y += fc_t(embed); y = S4_bidirectional(y);
  [conditional: y += mel_conv(upsampled mel)]; x = x + y;
  y = norm2(x); y = FF(x); out = x + y

TransposedLN (ref :11-20) normalizes over the CHANNEL axis per position with
scalar trainable (m, s).

TPU design notes: all pooling is pure reshapes + MXU matmuls; every block's
S4 kernel is a pure function of parameters, exposed via
:meth:`compute_kernels` so the sampling scan computes them once for all T
diffusion steps.  The UNet halves sequence length 4x per stage, so the
deepest (widest) stages run at L/16 — the reference's algorithmic answer to
long sequences, preserved here (SURVEY §5).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import WNConv1d, ZeroConv1d, TorchLinear, swish
from ..ops.mel_upsample import MelUpsampler
from .embedding import diffusion_step_embedding
from .s4 import S4

Dtype = Any


class TransposedLN(nn.Module):
    """LayerNorm over the channel (sublane) axis with scalar affine (m, s)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.m = self.param("m", nn.initializers.zeros, (1,),
                            self.param_dtype)
        self.s = self.param("s", nn.initializers.ones, (1,),
                            self.param_dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-2, keepdims=True)
        # torch.std_mean(unbiased=False): population std
        std = jnp.sqrt(jnp.var(x32, axis=-2, keepdims=True) + 0.0)
        y = (self.s.astype(jnp.float32) / std) * (
            x32 - mean + self.m.astype(jnp.float32))
        return y.astype(x.dtype)


class DownPool(nn.Module):
    """(B, H, L) -> (B, H_out, L/pool): reshape + weight-normed 1x1 conv."""

    d_input: int
    d_output: int
    pool: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.pool
        if x.ndim == 4:
            # compact (B, S, H, Rc): t = t1*S + t2; p | S so pooling only
            # splits the sublane axis t2 = t2'*p + phase -> new layout has
            # S' = S/p with the SAME Rc (the pooled tier's native layout,
            # since choose_layout scales S with n while R stays fixed).
            B, S, H, Rc = x.shape
            x = x.reshape(B, S // s, s, H, Rc)
            # '... h (l s) -> ... (h s) l': h-major channel stacking
            x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, S // s,
                                                          H * s, Rc)
        else:
            B, H, L = x.shape
            # '... h (l s) -> ... (h s) l' : h-major stacking of the s phases
            x = x.reshape(B, H, L // s, s)
            x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, H * s, L // s)
        return WNConv1d(self.d_input * s, self.d_output, kernel_size=1,
                        name="linear", dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)


class UpPool(nn.Module):
    """(B, H_in, L) -> (B, H_out, L*pool): 1x1 conv + inverse reshape."""

    d_input: int
    d_output: int
    pool: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.pool
        x = WNConv1d(self.d_input, self.d_output * s, kernel_size=1,
                     name="linear", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        if x.ndim == 4:
            # compact: inverse of DownPool's sublane split (same Rc)
            B, S, Hs, Rc = x.shape
            H = Hs // s
            x = x.reshape(B, S, H, s, Rc)
            return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, S * s, H, Rc)
        B, Hs, L = x.shape
        H = Hs // s
        # '... (h s) l -> ... h (l s)'
        x = x.reshape(B, H, s, L)
        return jnp.transpose(x, (0, 1, 3, 2)).reshape(B, H, L * s)


class DiffWaveBlock(nn.Module):
    d_model: int
    L: int
    ff: int = 2
    diffusion_step_embed_dim_out: int = 512
    unconditional: bool = True
    mel_upsample: Sequence[int] = (16, 16)
    dropout: float = 0.0
    v2_R: Optional[int] = None    # top-tier layout R (see S4.v2_R)
    kernel_fft_fast: Any = False  # construction-FFT precision (see S4)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.fc_t = TorchLinear(self.diffusion_step_embed_dim_out,
                                self.d_model, name="fc_t", **kw)
        self.s4 = S4(d_model=self.d_model, l_max=self.L, bidirectional=True,
                     dropout=self.dropout, v2_R=self.v2_R,
                     kernel_fft_fast=self.kernel_fft_fast, name="s4", **kw)
        self.norm1 = TransposedLN(name="norm1", **kw)
        self.norm2 = TransposedLN(name="norm2", **kw)
        self.ff1 = WNConv1d(self.d_model, self.ff * self.d_model,
                            kernel_size=1, name="ff1", **kw)
        self.ff2 = WNConv1d(self.ff * self.d_model, self.d_model,
                            kernel_size=1, name="ff2", **kw)
        if not self.unconditional:
            self.mel_upsampler = MelUpsampler(tuple(self.mel_upsample),
                                              name="mel_upsampler", **kw)
            self.mel_conv = WNConv1d(80, self.d_model, kernel_size=1,
                                     name="mel_conv", **kw)

    def compute_mel_cond(self, mel_spec: jnp.ndarray, L_gen: int,
                         compact: bool) -> jnp.ndarray:
        """This block's mel conditioning term ``mel_conv(upsample(mel))`` —
        a pure function of (mel, params), independent of the diffusion
        step, so the sampling loop computes it ONCE for all T steps (the
        reference recomputes the ConvTranspose upsample chain in every
        block of every step, models/sashimi.py:160-175)."""
        assert not self.unconditional
        if compact:
            from ..ops import fftconv2
            lay = self.s4.v2_layout(self.L)
            mel = self.mel_upsampler(mel_spec, lay.L)
            mel = fftconv2.to_compact(mel, lay).astype(self.dtype)
        else:
            mel = self.mel_upsampler(mel_spec, L_gen)
        return self.mel_conv(mel)

    def __call__(self, x: jnp.ndarray, step_embed: jnp.ndarray,
                 mel_spec: Optional[jnp.ndarray] = None,
                 kernel: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 stats: Optional[tuple] = None,
                 skip: Optional[jnp.ndarray] = None,
                 emit_stats: bool = False,
                 mel_cond: Optional[jnp.ndarray] = None):
        """Returns y, or (y, (mean, var)) of y over channels when
        ``emit_stats`` (the stats ride the block-scan carry so the next
        block's norm1 costs no extra HBM pass).  ``stats`` is this
        block's input (mean, var) — only consulted on the fused eval
        path, where the caller guarantees validity.  ``skip`` is a UNet
        skip added AFTER the whole block (u-stages)."""
        compact = x.ndim == 4                 # (B, S, H, Rc) channel-inner

        if compact and train and isinstance(kernel, (tuple, list)) \
                and self.s4.dropout == 0.0:
            # fused TRAIN path: conv via the fftconv2 custom VJP, both
            # residual branches via the chmix kernels with hand-written
            # fused backward kernels (norm1/bias stay XLA so their grads
            # come free with the stats chain)
            from ..ops import chmix, fftconv_pallas
            fast = fftconv_pallas.FAST["enabled"]
            y = self.norm1(x)
            bias = self.fc_t(step_embed)
            y = y + bias[:, None, :, None]
            res = x
            if mel_cond is not None:
                res = res + mel_cond.astype(x.dtype)
            elif mel_spec is not None:
                res = res + self.compute_mel_cond(
                    mel_spec, x.shape[-1], True).astype(x.dtype)
            x2 = self.s4(y, kernel=kernel, train=True, residual=res)
            out = chmix.ln_ff_res_train(
                x2, self.norm2.m, self.norm2.s,
                self.ff1.effective_weight()[:, :, 0], self.ff1.b,
                self.ff2.effective_weight()[:, :, 0], self.ff2.b, fast,
                skip=skip)
            if emit_stats:
                z = jnp.zeros((out.shape[0], out.shape[1], out.shape[3]),
                              jnp.float32)
                return out, (z, z)
            return out

        if compact and not train and isinstance(kernel, (tuple, list)):
            # eval fast path: the whole block runs in three fused HBM
            # passes — norm1 + step-bias ride the conv kernel as a
            # prologue, the S4 tail (output linear + GLU + residual) and
            # norm2 + FF + residual + UNet-skip are one chmix kernel each
            from ..ops import chmix, fftconv_pallas
            bias = self.fc_t(step_embed)                     # (B, H)
            if stats is None:
                x32 = x.astype(jnp.float32)
                mean = jnp.mean(x32, axis=2)                 # (B, S, Rc)
                var = jnp.var(x32, axis=2)
            else:
                mean, var = stats
            a = self.norm1.s.astype(jnp.float32) * jax.lax.rsqrt(var)
            cshift = (self.norm1.m.astype(jnp.float32) - mean) * a
            res = x
            if mel_cond is not None:
                res = res + mel_cond.astype(x.dtype)
            elif mel_spec is not None:
                res = res + self.compute_mel_cond(
                    mel_spec, x.shape[-1], True).astype(x.dtype)
            x = self.s4(x, kernel=kernel, train=train, residual=res,
                        prologue=(a, cshift, bias))
            fast = fftconv_pallas.FAST["enabled"]
            out = chmix.ln_ff_res(
                x, self.norm2.m, self.norm2.s,
                self.ff1.effective_weight()[:, :, 0], self.ff1.b,
                self.ff2.effective_weight()[:, :, 0], self.ff2.b, fast,
                skip=skip, emit_stats=emit_stats)
            if emit_stats:
                out, mo, vo = out
                return out, (mo, vo)
            return out

        y = self.norm1(x)
        bias = self.fc_t(step_embed)
        y = y + (bias[:, None, :, None] if compact else bias[:, :, None])
        y = self.s4(y, kernel=kernel, train=train)
        if mel_cond is not None:
            y = y + mel_cond.astype(y.dtype)
        elif mel_spec is not None:
            y = y + self.compute_mel_cond(mel_spec, y.shape[-1], compact)
        x = x + y
        y = self.norm2(x)
        y = self.ff2(jax.nn.gelu(self.ff1(y), approximate=False))
        y = x + y
        if skip is not None:
            y = y + skip
        if emit_stats:
            # dead placeholder on the unfused path (the consumer ignores
            # carried stats outside the fused branch)
            zshape = ((y.shape[0], y.shape[1], y.shape[3]) if compact
                      else (y.shape[0], y.shape[2]))
            z = jnp.zeros(zshape, jnp.float32)
            return y, (z, z)
        return y

    def compute_kernel(self, L: int) -> jnp.ndarray:
        return self.s4.compute_kernel(L)

    def compute_kernel_freq(self, L: int) -> jnp.ndarray:
        return self.s4.compute_kernel_freq(L)

    def compute_kernel_fact(self, L: int) -> jnp.ndarray:
        return self.s4.compute_kernel_fact(L)

    def compute_kernel_v2(self, L: int):
        return self.s4.compute_kernel_v2(L)


class _ScanBlock(nn.Module):
    """Scan-compatible adapter around DiffWaveBlock.

    ``nn.scan`` over this class runs a whole stage of n_layers identical
    blocks as ONE compiled loop body with stacked parameters — compile time
    per stage is one block, not n_layers blocks, and the structure is what
    XLA wants (a while loop over weights), replacing the reference's
    unrolled nn.ModuleList (models/sashimi.py:247-269).

    __call__(carry_x, kernel, skip, embed, mel, train) -> (x', emitted_skip)
      - kernel: this block's (stacked-over-blocks) S4 kernel, or None to
        compute in-block
      - skip: UNet skip to ADD after the block (u-stages), or None
      - emitted skip: the pre-block x (d-stages push onto the UNet stack)
    """

    d_model: int
    L: int
    ff: int = 2
    diffusion_step_embed_dim_out: int = 512
    unconditional: bool = True
    mel_upsample: Sequence[int] = (16, 16)
    dropout: float = 0.0
    v2_R: Optional[int] = None
    kernel_fft_fast: Any = False
    emit_skip: bool = False
    consume_skip: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.block = DiffWaveBlock(
            d_model=self.d_model, L=self.L, ff=self.ff,
            diffusion_step_embed_dim_out=self.diffusion_step_embed_dim_out,
            unconditional=self.unconditional,
            mel_upsample=tuple(self.mel_upsample), dropout=self.dropout,
            v2_R=self.v2_R, kernel_fft_fast=self.kernel_fft_fast,
            dtype=self.dtype, param_dtype=self.param_dtype, name="block")

    def __call__(self, carry, kernel, skip, embed, mel_spec, mel_cond,
                 train=False):
        x, mean, var = carry
        emitted = x if self.emit_skip else None
        y, (mo, vo) = self.block(
            x, embed, mel_spec, kernel, train, (mean, var),
            skip if self.consume_skip else None, True, mel_cond)
        return (y, mo, vo), emitted


# Same-(H, L) stage groups can construct their S4 kernels in one wide
# vmap (see Sashimi.compute_kernels).  Measured round 5 (v5e, within one
# session, scripts/kern_stage_breakdown.py + train_merge_check.py):
# isolated construction fwd+bwd 78.7 ms unmerged vs 100.3 merged (wider
# vmap inflates backward buffers), full B32 train step 638.3 vs 647.2 ms
# — per-stage sums equal the whole program, i.e. there is NO program-
# count scheduling slack to reclaim, and ~46% of construction is the
# speed-of-light VPU cauchy kernel.  Default OFF; both paths are exact
# (tests/test_kernel_merge.py pins them bitwise-equal).
MERGE_STAGES = {"enabled": False}


def _make_stack(n: int, remat: bool, **cfg):
    # static_argnums: `train` (index 7 counting the module instance as 0)
    # must stay a Python bool under jax.checkpoint — it selects code paths
    # (fused-GELU vs plain conv, dropout) inside S4.
    #
    # policy: save the two expensive fused-kernel outputs per block
    # (models/s4.py tags "conv_out"/"glu_out"), so the remat recompute is
    # norm1/bias/GELU elementwise only instead of re-running the conv and
    # GLU kernels.  Costs 2 activation tensors per block (~33 MB each at
    # B8 tier 1); everything else still recomputes.  On paths that never
    # tag (CPU/XLA fallback) the policy saves nothing == plain remat.
    cls = nn.remat(
        _ScanBlock, static_argnums=(7,),
        policy=jax.checkpoint_policies.save_only_these_names(
            "conv_out", "glu_out")) if remat else _ScanBlock
    scan = nn.scan(
        cls,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(0, 0, nn.broadcast, nn.broadcast, 0, nn.broadcast),
        out_axes=0,
        length=n)
    return scan(**cfg)


class Sashimi(nn.Module):
    """eps_theta((x_t, t), mel) with the reference constructor surface."""

    in_channels: int = 1
    out_channels: int = 1
    d_model: int = 64
    n_layers: int = 8
    pool: Sequence[int] = (4, 4)
    expand: int = 2
    ff: int = 2
    unet: bool = True
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512
    unconditional: bool = True
    mel_upsample: Sequence[int] = (16, 16)
    dropout: float = 0.0
    L: int = 16000
    block_scan: bool = True  # nn.scan stages (stacked params, 1-block compile)
    remat: bool = False   # jax.checkpoint each block (memory <-> recompute)
    kernel_fft_fast: Any = False  # per-step S4 construction-FFT precision
    #   construction — the training-throughput lever (construction is 61%
    #   of the B8 train step and MXU-FFT-bound at HIGHEST precision,
    #   scripts/train_ablation.py / kern_ablation.py).  Sampling hoists
    #   construction out of the T-step loop, so generation keeps strict
    #   f32 regardless.
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(ff=self.ff,
                   diffusion_step_embed_dim_out=self.diffusion_step_embed_dim_out,
                   unconditional=self.unconditional,
                   mel_upsample=tuple(self.mel_upsample),
                   dropout=self.dropout, v2_R=self._v2R(),
                   kernel_fft_fast=self.kernel_fft_fast, **kw)

        self.init_conv = WNConv1d(self.in_channels, self.d_model,
                                  kernel_size=1, name="init_conv", **kw)
        self.fc_t1 = TorchLinear(self.diffusion_step_embed_dim_in,
                                 self.diffusion_step_embed_dim_mid,
                                 name="fc_t1", **kw)
        self.fc_t2 = TorchLinear(self.diffusion_step_embed_dim_mid,
                                 self.diffusion_step_embed_dim_out,
                                 name="fc_t2", **kw)

        H, L = self.d_model, self.L
        if self.block_scan:
            n = self.n_layers
            d_stacks, d_pools, stage_dims = [], [], []
            for si, p in enumerate(self.pool):
                stage_dims.append((H, L))
                if self.unet:
                    d_stacks.append(_make_stack(
                        n, self.remat, d_model=H, L=L, emit_skip=True,
                        name=f"d{si}_blocks", **bkw))
                d_pools.append(DownPool(H, H * self.expand, pool=p,
                                        name=f"down{si}", **kw))
                L //= p
                H *= self.expand
            self.d_stacks, self.d_pools = d_stacks, d_pools
            self._stage_dims = tuple(stage_dims)
            self._center_dims = (H, L)

            self.c_stack = _make_stack(n, self.remat, d_model=H, L=L,
                                       name="c_blocks", **bkw)

            u_stacks, u_pools = [], []
            for si, p in enumerate(self.pool[::-1]):
                H //= self.expand
                L *= p
                u_pools.append(UpPool(H * self.expand, H, pool=p,
                                      name=f"up{si}", **kw))
                u_stacks.append(_make_stack(
                    n, self.remat, d_model=H, L=L,
                    consume_skip=self.unet, name=f"u{si}_blocks", **bkw))
            self.u_stacks, self.u_pools = u_stacks, u_pools
        else:
            Block = (nn.remat(
                DiffWaveBlock, static_argnums=(5,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "glu_out"))
                if self.remat else DiffWaveBlock)
            d_mods, d_kinds = [], []
            for si, p in enumerate(self.pool):
                if self.unet:
                    for j in range(self.n_layers):
                        d_mods.append(Block(
                            d_model=H, L=L, name=f"d{si}_block{j}", **bkw))
                        d_kinds.append("block")
                d_mods.append(DownPool(H, H * self.expand, pool=p,
                                       name=f"down{si}", **kw))
                d_kinds.append("pool")
                L //= p
                H *= self.expand
            self.d_mods, self.d_kinds = d_mods, tuple(d_kinds)

            self.c_mods = [Block(d_model=H, L=L, name=f"c_block{j}",
                                 **bkw)
                           for j in range(self.n_layers)]

            u_mods, u_kinds = [], []
            for si, p in enumerate(self.pool[::-1]):
                H //= self.expand
                L *= p
                u_mods.append(UpPool(H * self.expand, H, pool=p,
                                     name=f"up{si}", **kw))
                u_kinds.append("pool")
                for j in range(self.n_layers):
                    u_mods.append(Block(
                        d_model=H, L=L, name=f"u{si}_block{j}", **bkw))
                    u_kinds.append("block")
            self.u_mods, self.u_kinds = u_mods, tuple(u_kinds)

        self.norm = TransposedLN(name="norm", **kw)
        self.final_conv1 = WNConv1d(self.d_model, self.d_model, kernel_size=1,
                                    name="final_conv1", **kw)
        self.final_conv2 = ZeroConv1d(self.d_model, self.out_channels,
                                      name="final_conv2", **kw)

    def _stage_lengths(self, L0: int):
        """Per-block sequence lengths for an input of length L0."""
        d_L, L = [], L0
        for p in self.pool:
            if self.unet:
                d_L.extend([L] * self.n_layers)
            d_L.append(None)  # pool entry
            L //= p
        c_L = [L] * self.n_layers
        u_L = []
        for p in self.pool[::-1]:
            u_L.append(None)
            L *= p
            u_L.extend([L] * self.n_layers)
        return d_L, c_L, u_L

    @nn.nowrap
    def _v2R(self) -> int:
        """Layout-family R shared by every tier's fused conv: derived
        from the TOP tier's FFT size (ops/fftconv2.default_R) so pooled
        tiers keep the parent layout (S/p, same R and Rc)."""
        from ..ops import fftconv2
        return fftconv2.default_R(1 << (2 * self.L - 1).bit_length())

    @nn.nowrap
    def _block_template(self, H: int, L_trained: int) -> DiffWaveBlock:
        # parent=None: a detached template for raw-vmap application over the
        # stacked stage params (never bound into this module's tree)
        return DiffWaveBlock(
            d_model=H, L=L_trained, ff=self.ff,
            diffusion_step_embed_dim_out=self.diffusion_step_embed_dim_out,
            unconditional=self.unconditional,
            mel_upsample=tuple(self.mel_upsample), v2_R=self._v2R(),
            kernel_fft_fast=self.kernel_fft_fast,
            dtype=self.dtype, param_dtype=self.param_dtype, parent=None)

    def _scan_stage_info(self, audio_length: int):
        """[(stage_name, H, L_trained, L_gen)] for every block stack."""
        info = []
        Lg = audio_length
        dims = list(self._stage_dims)
        for si, (H, Lt) in enumerate(dims):
            if self.unet:
                info.append((f"d{si}_blocks", H, Lt, Lg))
            Lg //= self.pool[si]
        Hc, Lc = self._center_dims
        info.append(("c_blocks", Hc, Lc, Lg))
        n_stages = len(dims)
        for si in range(n_stages):
            H, Lt = dims[n_stages - 1 - si]
            Lg *= self.pool[n_stages - 1 - si]
            info.append((f"u{si}_blocks", H, Lt, Lg))
        return info

    def v2_compatible(self, audio_length: int) -> bool:
        """True when the whole forward can run in ONE channel-inner compact
        layout (ops/fftconv2): generation length == trained length, every
        tier's layout (shared family R, see :meth:`_v2R`) fits the fused
        kernels' VMEM frame, and channel counts divide the kernel's
        channel blocking.  Long top tiers (n > 2^16, e.g. the
        44000-sample LJSpeech-harder point) get R = n/256 so S stays at
        256 and the frame fits (ops/fftconv2.default_R)."""
        if not self.block_scan or audio_length != self.L:
            return False
        if self.d_model % 8 != 0:
            return False
        from ..ops import fftconv2
        R = self._v2R()
        n_top = 1 << (2 * self.L - 1).bit_length()
        if n_top % R != 0:
            return False
        Rc0 = fftconv2.choose_layout(self.L, n_top, self.d_model, R=R).Rc
        H, L, n_parent = self.d_model, self.L, n_top
        tiers = [(H, L, n_top, None)]
        for p in self.pool:
            if L % p != 0:
                return False
            H, L = H * self.expand, L // p
            n_t = 1 << (2 * L - 1).bit_length()
            # DownPool's compact reshape splits the parent's sublane axis
            # by p, so the child tier's NATIVE layout must have exactly
            # S_parent / p rows (n_t == n_parent / p) — non-power-of-2
            # pools (e.g. p=5) break this and must take the flat path
            if n_t * p != n_parent:
                return False
            tiers.append((H, L, n_t, p))
            n_parent = n_t
        for Ht, Lt, n_t, _ in tiers:
            if n_t // R < 8 or n_t % R != 0:
                return False   # deepest tier's S below one sublane tile
            lay = fftconv2.choose_layout(Lt, n_t, Ht, R=R,
                                         bf16=self.dtype == jnp.bfloat16)
            if not fftconv2.layout_feasible(lay):
                return False
            if lay.Rc != Rc0:
                return False   # pooled reshape requires one Rc family-wide
        return True

    def compute_kernels(self, audio_length: int,
                        freq: bool = False) -> Dict[str, jnp.ndarray]:
        """All S4 conv kernels for sequences of ``audio_length`` samples.

        Pure function of parameters — call once, reuse across all T sampling
        steps (the reference recomputes these every network forward).  With
        ``freq=True`` the kernels are returned already combined + rfft'd
        (complex), removing 2x n_blocks FFTs from every sampling step.

        In ``block_scan`` layout the values are stacked per stage,
        shape (n_layers, ...), keyed by stage name.
        """
        if self.block_scan:
            # raw vmap over each stage's stacked params (no flax lifting:
            # the bound scan modules own the params; we read them directly).
            # Same-(H, L) stages (d0+u1, d1+u0 in the default UNet) merge
            # into ONE wide vmap: the construction cost is dominated by
            # many small latency/HBM-bound ops (BASELINE.md round-4), so
            # fewer, wider programs — 5 stages -> 3 at the flagship point —
            # attack exactly that.  Identical math: the per-block chain is
            # elementwise in the vmap axis.
            method = {False: DiffWaveBlock.compute_kernel,
                      True: DiffWaveBlock.compute_kernel_freq,
                      "fact": DiffWaveBlock.compute_kernel_fact,
                      "v2": DiffWaveBlock.compute_kernel_v2}[freq]
            all_params = self.variables["params"]
            kernels: Dict[str, jnp.ndarray] = {}
            groups: Dict[tuple, list] = {}
            for name, H, Lt, Lg in self._scan_stage_info(audio_length):
                key = ((H, Lt, Lg) if MERGE_STAGES["enabled"]
                       else (name, H, Lt, Lg))
                groups.setdefault(key, []).append(name)
            for key, names in groups.items():
                H, Lt, Lg = key[-3:]
                tmpl = self._block_template(H, Lt)

                def one(p, tmpl=tmpl, Lg=Lg):
                    return tmpl.apply({"params": p}, Lg, method=method)

                stacks = [all_params[n]["block"] for n in names]
                merged = None
                if len(stacks) > 1:
                    try:  # requires identical param-tree structure
                        merged = jax.tree.map(
                            lambda *xs: jnp.concatenate(xs, axis=0), *stacks)
                    except (ValueError, TypeError):
                        merged = None
                if merged is None and len(stacks) > 1:
                    for n, s in zip(names, stacks):
                        kernels[n] = jax.vmap(one)(s)
                    continue
                out = jax.vmap(one)(stacks[0] if merged is None else merged)
                off = 0
                for n, s in zip(names, stacks):
                    sz = jax.tree.leaves(s)[0].shape[0]
                    kernels[n] = jax.tree.map(
                        lambda x, o=off, z=sz: x[o:o + z], out)
                    off += sz
            return kernels

        d_L, c_L, u_L = self._stage_lengths(audio_length)
        get = {False: (lambda m, L: m.compute_kernel(L)),
               True: (lambda m, L: m.compute_kernel_freq(L)),
               "fact": (lambda m, L: m.compute_kernel_fact(L)),
               "v2": (lambda m, L: m.compute_kernel_v2(L))}[freq]
        kernels = {}
        for mod, L in zip(self.d_mods, d_L):
            if L is not None:
                kernels[mod.name] = get(mod, L)
        for mod, L in zip(self.c_mods, c_L):
            kernels[mod.name] = get(mod, L)
        for mod, L in zip(self.u_mods, u_L):
            if L is not None:
                kernels[mod.name] = get(mod, L)
        return kernels

    def compute_mel_conds(self, mel_spec: jnp.ndarray, audio_length: int,
                          compact: bool = True) -> Dict[str, jnp.ndarray]:
        """Per-stage mel conditioning terms, stacked over blocks like
        :meth:`compute_kernels` — pure functions of (mel, params),
        independent of the diffusion step, so the sampling loop computes
        them once for all T steps instead of re-running every block's
        ConvTranspose upsample chain 18x per step (this was ~95% of the
        vocoder sampling step at the LJSpeech-harder point).

        Returns {stage: (n_layers, B, S, H, Rc)} in compact layout (or
        (n_layers, B, H, L) flat)."""
        assert self.block_scan, "mel-cond hoisting requires block_scan"
        conds: Dict[str, jnp.ndarray] = {}
        for name, H, Lt, Lg in self._scan_stage_info(audio_length):
            tmpl = self._block_template(H, Lt)
            stacked = self.variables["params"][name]["block"]

            def one(p, tmpl=tmpl, Lg=Lg):
                return tmpl.apply({"params": p}, mel_spec, Lg, compact,
                                  method=DiffWaveBlock.compute_mel_cond)

            # sequential over blocks: the ConvTranspose upsample chain's
            # transients are ~GB-class at long L — vmapping all n_layers
            # at once has OOM'd 15.75 GB HBM at the LJSpeech-harder point
            conds[name] = jax.lax.map(one, stacked)
        return conds

    def __call__(self, audio: jnp.ndarray, diffusion_steps: jnp.ndarray,
                 mel_spec: Optional[jnp.ndarray] = None,
                 kernels: Optional[Dict[str, jnp.ndarray]] = None,
                 train: bool = False,
                 mel_conds: Optional[Dict[str, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        assert audio.shape[-1] % int(
            math.prod(self.pool)) == 0, "audio length must divide the pooling"

        if self.block_scan and kernels is None and not self.is_initializing() \
                and jax.default_backend() in ("tpu", "axon") \
                and self.d_model % 8 == 0:
            # training-path fast conv: compute fused-conv kernels once per
            # step; gradients flow through compute_kernels (cauchy,
            # Woodbury, irfft) and the conv's exact custom_vjp.  Very long
            # segments (n > 2^16) exceed the fused kernels' VMEM frames:
            # leave kernels=None so the blocks run the XLA conv path
            n = 1 << (2 * audio.shape[-1] - 1).bit_length()
            if self.v2_compatible(audio.shape[-1]):
                kernels = self.compute_kernels(audio.shape[-1], "v2")
            elif n <= 1 << 16:
                kernels = self.compute_kernels(audio.shape[-1], "fact")
        compact = (self.block_scan and kernels is not None
                   and isinstance(next(iter(kernels.values())),
                                  (tuple, list)))
        x = audio.astype(self.dtype)
        if compact:
            # the whole forward runs in the channel-inner compact layout
            # (ops/fftconv2): relayout only this 1-channel input and the
            # 1-channel eps output
            assert audio.shape[-1] == self.L, (audio.shape, self.L)
            from ..ops import fftconv2
            lay0 = fftconv2.choose_layout(
                self.L, 1 << (2 * self.L - 1).bit_length(), self.d_model,
                R=self._v2R())
            x = fftconv2.to_compact(x, lay0)

        x = jax.nn.relu(self.init_conv(x))

        embed = diffusion_step_embedding(
            diffusion_steps, self.diffusion_step_embed_dim_in,
            dtype=jnp.float32).astype(self.dtype)
        embed = swish(self.fc_t1(embed))
        embed = swish(self.fc_t2(embed))

        if self.block_scan:
            kget = (lambda name: None) if kernels is None else kernels.get
            cget = (lambda name: None) if mel_conds is None \
                else mel_conds.get
            if mel_conds is not None:
                mel_spec = None      # hoisted conditioning replaces it
            fused = compact and not train

            def carry0(x):
                """Initial (x, mean, var) scan carry for a stage: real
                channel stats on the fused eval path (consumed by the
                first block's norm1 prologue; later blocks' stats ride
                the carry from ln_ff_res), dead zeros otherwise."""
                if fused:
                    x32 = x.astype(jnp.float32)
                    return x, jnp.mean(x32, axis=2), jnp.var(x32, axis=2)
                zshape = ((x.shape[0], x.shape[1], x.shape[3])
                          if x.ndim == 4 else (x.shape[0], x.shape[2]))
                z = jnp.zeros(zshape, jnp.float32)
                return x, z, z

            pool_skips, stage_skips = [], []
            for si, dp in enumerate(self.d_pools):
                if self.unet:
                    (x, _, _), emitted = self.d_stacks[si](
                        carry0(x), kget(f"d{si}_blocks"), None, embed,
                        mel_spec, cget(f"d{si}_blocks"), train)
                    stage_skips.append(emitted)   # (n, B, H, L) pre-block xs
                pool_skips.append(x)              # pre-DownPool
                x = dp(x)

            c_pre = x
            (x, _, _), _ = self.c_stack(carry0(x), kget("c_blocks"), None,
                                        embed, mel_spec, cget("c_blocks"),
                                        train)
            x = x + c_pre

            n_stages = len(self.d_pools)
            for si, up in enumerate(self.u_pools):
                x = up(x)
                x = x + pool_skips.pop()
                skips = None
                if self.unet:
                    # u blocks consume the matching d stage's pre-block xs
                    # in reverse push order (the reference's outputs.pop())
                    skips = jnp.flip(stage_skips[n_stages - 1 - si], axis=0)
                (x, _, _), _ = self.u_stacks[si](
                    carry0(x), kget(f"u{si}_blocks"), skips, embed,
                    mel_spec, cget(f"u{si}_blocks"), train)

            x = self.norm(x)
            x = jax.nn.relu(self.final_conv1(x))
            x = self.final_conv2(x)
            if compact:
                x = fftconv2.from_compact(x, lay0)
            return x.astype(jnp.float32)

        k = (lambda mod: None) if kernels is None else (
            lambda mod: kernels.get(mod.name))
        outputs = []
        for mod, kind in zip(self.d_mods, self.d_kinds):
            outputs.append(x)
            if kind == "block":
                x = mod(x, embed, mel_spec, k(mod), train)
            else:
                x = mod(x)

        outputs.append(x)
        for mod in self.c_mods:
            x = mod(x, embed, mel_spec, k(mod), train)
        x = x + outputs.pop()

        for mod, kind in zip(self.u_mods, self.u_kinds):
            if kind == "block":
                x = mod(x, embed, mel_spec, k(mod), train)
                if self.unet:
                    x = x + outputs.pop()
            else:
                x = mod(x)
                x = x + outputs.pop()

        x = self.norm(x)
        x = jax.nn.relu(self.final_conv1(x))
        x = self.final_conv2(x)
        return x.astype(jnp.float32)
