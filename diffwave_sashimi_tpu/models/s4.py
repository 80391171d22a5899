"""S4: Structured State Space sequence layer (TPU-native rebuild).

Functionality parity with the reference standalone S4 (models/s4.py:1279-1470
``S4``, :1140-1277 ``SSKernel``, :520-1001 ``SSKernelNPLR``, :1003-1136
``SSKernelDiag``), redesigned for JAX/XLA:

- All kernel state is explicit: the train-length truncation transform
  C -> C~ happens once at parameter initialization (the reference mutates its
  C parameter in-place on first forward, models/s4.py:538-549); generation
  beyond the trained length uses a functional doubling (ops/nplr.extend_C)
  instead of buffer mutation.
- The Cauchy resolvent evaluation uses the real-coefficient matmul
  formulation (ops/cauchy.py) — the TPU equivalent of the reference's CUDA
  extension — or a fused Pallas kernel when enabled.
- The convolution kernel depends only on parameters (not on the input or the
  diffusion step), so callers can compute it once via ``compute_kernel`` and
  reuse it across all T sampling steps; the reference rebuilds the kernel in
  every forward.
- FFT convolution via batched ``jnp.fft.rfft/irfft`` (the reference's cuFFT
  calls, models/s4.py:1403-1406).

Stored complex parameters use the torch ``view_as_real`` convention
(trailing dim 2) so reference checkpoints map 1:1 (utils/torch_compat.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import hippo
from ..ops.cauchy import cauchy_sym
from ..ops.cauchy_pallas import cauchy_sym_pallas, MAX_BWD_L
from ..ops.vandermonde import log_vandermonde
from ..ops.nplr import (discretize, setup_C, extend_C, power_contract,
                        _conj as nplr_conj)
from ..ops.conv import torch_uniform_init
from ..ops import mxu_fft
from ..ops import fftconv_pallas
from ..ops import fftconv2
from ..ops.fftconv_pallas import fftconv_fused, factorize_kernel_freq

Dtype = Any


def _r2c(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) real view -> complex."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def _c2r(x: np.ndarray) -> np.ndarray:
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _rfft(x, n):
    """MXU four-step FFT on TPU (XLA's FFT runs ~0.3 TFLOP/s on the VPU;
    the matmul formulation is ~2 orders faster, see ops/mxu_fft.py)."""
    if _on_tpu():
        return mxu_fft.rfft_mxu(x, n)
    return jnp.fft.rfft(x, n=n)


def _irfft(X, n):
    if _on_tpu():
        return mxu_fft.irfft_mxu(X, n)
    return jnp.fft.irfft(X, n=n)


def _fft_size(min_n: int) -> int:
    """Next power of two >= min_n: radix-2 FFTs are much faster on TPU than
    the mixed-radix sizes the reference uses (n = L_kernel + L, e.g. 32000).
    Any n >= L + L_kernel - 1 gives the identical linear-convolution result
    on the kept [0, L) samples."""
    return 1 << (min_n - 1).bit_length()


def _combine_bidirectional(k: jnp.ndarray, c: int, n: int) -> jnp.ndarray:
    """Fold the (2c, H, L_k) forward/backward kernels into one length-n
    circular kernel (c, H, n).

    The reference combines as pad(k0, (0, L)) + pad(flip(k1), (L, 0)) and
    FFTs at EXACTLY n = L_kernel + L (ref models/s4.py:1391-1394), so the
    anticausal taps k1[j] land at position n - j, i.e. circular lag -j.  We
    FFT at the next power of two, so the anticausal block must sit at the
    END of the n-buffer — placing it at [L, L + L_k) like the reference
    buffer layout would shift every anticausal tap by (n - L - L_k) samples.
    """
    L_k = k.shape[-1]
    assert n >= 2 * L_k, (n, L_k)
    k0, k1 = k[:c], k[c:]
    return jnp.pad(k0, ((0, 0), (0, 0), (0, n - L_k))) \
        + jnp.pad(jnp.flip(k1, axis=-1), ((0, 0), (0, 0), (n - L_k, 0)))


class SSKernelNPLR(nn.Module):
    """K_L(dA, dB, C~) for A = diag(w) - P P^* (full S4).

    Parameters (shapes use N = d_state/2 half pairs, S = n_ssm, c = channels):
      log_dt (H,), B (1, S, N, 2), P (rank, S, N, 2), inv_w_real (S, N),
      w_imag (S, N), C (c, H, N, 2) — C is stored *post* train-length setup.
    """

    H: int
    N: int = 64            # full state size; half (N//2) pairs are stored
    l_max: int = 1
    channels: int = 1
    measure: str = "legs"
    rank: int = 1
    n_ssm: Optional[int] = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    deterministic: bool = False
    real_tolerance: float = 1e-3
    bandlimit: Optional[float] = None   # mask C above this frequency (ref :707-713)
    cauchy: str = "auto"   # 'auto' | 'pallas' | 'xla' | 'naive'
    fft_fast: Any = False  # MXU irfft precision in kernel construction:
    #   "strict" f32 (6-pass), "high" bf16x3 (3-pass, rel err ~1e-6),
    #   True bf16 (1-pass, rel err ~2e-3).  NOTE: the default False DEFERS
    #   to the module-global ops.mxu_fft.set_fast_mode toggle (strict
    #   unless toggled); pass "strict" to force strict regardless of the
    #   global.  Per-TRAIN-step construction is MXU-FFT-bound at HIGHEST
    #   precision (scripts/kern_ablation.py); sampling hoists construction
    #   so it keeps the strict default

    def setup(self):
        H, N2 = self.H, self.N // 2
        S = self.n_ssm if self.n_ssm is not None else H
        assert self.H % S == 0
        w_np, P_np, B_np = hippo.combination(self.measure, self.N, self.rank, S)

        def log_dt_init(rng, shape):
            if self.deterministic:
                return jnp.linspace(math.log(self.dt_min),
                                    math.log(self.dt_max), H)
            u = jax.random.uniform(rng, shape)
            return u * (math.log(self.dt_max) - math.log(self.dt_min)) \
                + math.log(self.dt_min)

        self.log_dt = self.param("log_dt", log_dt_init, (H,))
        self.B = self.param("B", lambda rng, s: jnp.asarray(
            _c2r(B_np[None, :, :])), (1, S, N2, 2))
        self.P = self.param("P", lambda rng, s: jnp.asarray(
            _c2r(P_np)), (self.rank, S, N2, 2))
        w_real = np.clip(w_np.real, None, -self.real_tolerance)
        self.inv_w_real = self.param(
            "inv_w_real",
            lambda rng, s: jnp.asarray(np.log(-w_real), jnp.float32), (S, N2))
        self.w_imag = self.param(
            "w_imag", lambda rng, s: jnp.asarray(w_np.imag, jnp.float32),
            (S, N2))

        def C_init(rng, shape):
            # Raw C ~ CN(0, 1) (torch.randn cfloat: each part var 1/2),
            # then apply the train-length transform C~ = (I - dA^L)^* C that
            # the reference performs lazily on first forward.
            C_raw = jax.random.normal(rng, (self.channels, H, N2),
                                      dtype=jnp.complex64)
            if self.l_max is None or self.l_max <= 0:
                C_t = C_raw
            else:
                w = self._w_from(jnp.asarray(np.log(-w_real)),
                                 jnp.asarray(w_np.imag))
                dt = jnp.exp(self.log_dt)  # init value, created above
                rep = H // S
                w_b = jnp.tile(w, (rep, 1))
                P_b = jnp.tile(_r2c(jnp.asarray(_c2r(P_np))), (1, rep, 1))
                B_b = jnp.tile(_r2c(jnp.asarray(_c2r(B_np))), (rep, 1))
                dA, _ = discretize(w_b, P_b, B_b, dt)
                C_t = setup_C(C_raw, dA, self.l_max)
            return jnp.stack([C_t.real, C_t.imag], axis=-1)

        self.C = self.param("C", C_init, (self.channels, H, N2, 2))

    def _w_from(self, inv_w_real, w_imag) -> jnp.ndarray:
        return jax.lax.complex(-jnp.exp(inv_w_real), w_imag)

    def _w(self) -> jnp.ndarray:
        return self._w_from(self.inv_w_real, self.w_imag)

    def _broadcast(self, x: jnp.ndarray, axis: int) -> jnp.ndarray:
        S = x.shape[axis]
        if S == self.H:
            return x
        # einops 't n -> (v t) n': TILE the n_ssm copies (not interleave)
        reps = [1] * x.ndim
        reps[axis] = self.H // S
        return jnp.tile(x, reps)

    def __call__(self, L: int, rate: float = 1.0,
                 state: Optional[jnp.ndarray] = None):
        """Compute the length-L convolution kernel, shape (channels, H, L).

        Mirrors ref SSKernelNPLR.forward (models/s4.py:674-822).  ``L`` may
        exceed ``l_max``; the C~ doubling is then done functionally on the
        fly.  ``rate`` resamples the kernel: the continuous support stays
        ``l_max`` while the discrete grid is ``l_max / rate`` (ref
        models/s4.py:689-702).  With ``state`` (B, H, N2) complex, also
        returns ``k_state`` (B, channels, H, L) — the initial state's
        contribution to the output (ref models/s4.py:727-744, 799-808) — as
        a (k, k_state) tuple.
        """
        internal_L = self.l_max if (self.l_max and self.l_max > 0) else L
        C = _r2c(self.C)

        dt = jnp.exp(self.log_dt) * rate                   # (H,)
        w = self._broadcast(self._w(), 0)                  # (H, N2)
        if self.bandlimit is not None:
            freqs = dt[:, None] / rate * jnp.abs(w.imag) / (2 * math.pi)
            C = C * jnp.where(freqs < self.bandlimit * 0.5, 1.0, 0.0)
        B = self._broadcast(_r2c(self.B), 1)               # (1, H, N2)
        P = self._broadcast(_r2c(self.P), 1)               # (r, H, N2)
        Q = jnp.conj(P)

        continuous_L = int(round(rate * L))
        if continuous_L > internal_L:
            dA, _ = discretize(w, P, B[0], dt)
            C, internal_L = extend_C(C, dA, internal_L, continuous_L)
        discrete_L = int(round(internal_L / rate))

        n_state = 0
        if state is not None:
            # "Un-bilinear" the state into the same type as B
            # (ref models/s4.py:727-744): s' = state/dt + (A^* applied)/2.
            s = nplr_conj(state)                           # (B, H, 2*N2)
            sA = s * nplr_conj(w) \
                - jnp.einsum("bhm,rhm,rhn->bhn", s,
                             nplr_conj(Q), nplr_conj(P))
            s = s / dt[:, None] + sA / 2
            s = s[..., : self.N // 2]                      # back to half
            B = jnp.concatenate([s, B], axis=0)            # (B+1, H, N2)
            n_state = state.shape[0]

        # FFT nodes as HOST numpy constants: c64 pow accumulation matches
        # the reference roundoff at the Nyquist node (where the exact
        # bilinear image is infinite), and numpy constants embed into the
        # compiled program without any device->host readback at lowering.
        omega_np = (np.complex64(np.exp(-2j * np.pi / discrete_L))
                    ** np.arange(discrete_L // 2 + 1, dtype=np.float32))
        omega_np = omega_np.astype(np.complex64)
        z_np = (2 * (1 - omega_np) / (1 + omega_np)).astype(np.complex64)
        omega, z = jnp.asarray(omega_np), jnp.asarray(z_np)

        wt = w * dt[:, None]                               # (H, N2)

        Bstack = jnp.concatenate([B, P], axis=0)           # (1+r, H, N2)
        Cstack = jnp.concatenate([C, Q], axis=0)           # (c+r, H, N2)
        v = Bstack[:, None] * Cstack[None, :]              # (1+r, c+r, H, N2)

        impl = self.cauchy
        if impl == "auto":
            # fused Pallas kernel on TPU (bwd kernel is VMEM-bounded in L);
            # the axon PJRT plugin reports platform "axon" for TPU hardware
            on_tpu = jax.default_backend() in ("tpu", "axon")
            impl = "pallas" if on_tpu and len(z) <= MAX_BWD_L else "xla"
        if impl == "pallas":
            r = cauchy_sym_pallas(v, z, wt)                # (1+r, c+r, H, L')
        else:
            r = cauchy_sym(v, z, wt)                       # (1+r, c+r, H, L')
        r = r * dt[None, None, :, None]

        # Low-rank Woodbury correction (ref models/s4.py:765-790).
        if self.rank == 1:
            k_f = r[:-1, :-1] - r[:-1, -1:] * r[-1:, :-1] / (1 + r[-1:, -1:])
        elif self.rank == 2:
            r00, r01 = r[:-2, :-2], r[:-2, -2:]
            r10, r11 = r[-2:, :-2], r[-2:, -2:]
            det = (1 + r11[:1, :1]) * (1 + r11[1:, 1:]) \
                - r11[:1, 1:] * r11[1:, :1]
            s = (r01[:, :1] * (1 + r11[1:, 1:]) * r10[:1]
                 + r01[:, 1:] * (1 + r11[:1, :1]) * r10[1:]
                 - r01[:, :1] * r11[:1, 1:] * r10[1:]
                 - r01[:, 1:] * r11[1:, :1] * r10[:1]) / det
            k_f = r00 - s
        else:
            rk = self.rank
            r00, r01 = r[:-rk, :-rk], r[:-rk, -rk:]
            r10, r11 = r[-rk:, :-rk], r[-rk:, -rk:]
            r11 = jnp.moveaxis(r11, (0, 1), (-2, -1))      # (H, L', r, r)
            r11 = jnp.linalg.inv(jnp.eye(rk, dtype=r.dtype) + r11)
            r11 = jnp.moveaxis(r11, (-2, -1), (0, 1))
            k_f = r00 - jnp.einsum("ijhl,jkhl,klhl->ilhl", r01, r11, r10)

        k_f = k_f * 2 / (1 + omega)                        # bilinear fix
        # MXU irfft (matmul four-step, composite sizes like 16000 =
        # 125 x 128 supported): the XLA VPU FFT here was the single
        # largest piece of per-step kernel construction in training
        if _on_tpu() and discrete_L % 2 == 0:
            k = mxu_fft.irfft_mxu(k_f, discrete_L,
                                  fast=self.fft_fast or None)[..., :L]
        else:
            k = jnp.fft.irfft(k_f, n=discrete_L)[..., :L]  # (B+1, c, H, L)
        if n_state:
            return k[-1], k[:-1]
        return k[0]

    def forward_state(self, u: jnp.ndarray, state: jnp.ndarray
                      ) -> jnp.ndarray:
        """Forward the recurrent state through a length-L chunk:
        x_L = dA^L x_0 + sum_i dA^i dB u_{L-1-i} (ref SSKernel.forward_state,
        models/s4.py:1252-1273).

        u: (..., H, L) real; state: (..., H, N2) complex (half pairs).
        Returns the same state shape.
        """
        dt = jnp.exp(self.log_dt)
        w = self._broadcast(self._w(), 0)
        B = self._broadcast(_r2c(self.B), 1)
        P = self._broadcast(_r2c(self.P), 1)
        dA, dB = discretize(w, P, B[0], dt)                # (H,2N,2N),(H,2N)
        s = nplr_conj(state)                               # (..., H, 2N)
        v = dB[:, :, None] * jnp.flip(u, -1)[..., None, :].astype(dA.dtype)
        AL, v = power_contract(u.shape[-1], dA, v)         # (..., H, 2N)
        next_state = jnp.einsum("hmn,...hn->...hm", AL, s,
                                precision=jax.lax.Precision.HIGHEST) + v
        return next_state[..., : state.shape[-1]]


class SSKernelDiag(nn.Module):
    """Diagonal (S4D) kernel via the log-Vandermonde contraction.

    Parity with ref SSKernelDiag (models/s4.py:1003-1136); ``disc`` in
    {'zoh', 'bilinear'}.
    """

    H: int
    N: int = 64
    l_max: int = 1
    channels: int = 1
    measure: str = "diag-lin"
    n_ssm: Optional[int] = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    disc: str = "bilinear"
    deterministic: bool = False
    bandlimit: Optional[float] = None

    def setup(self):
        H, N2 = self.H, self.N // 2
        S = self.n_ssm if self.n_ssm is not None else H
        w_np, _, B_np = hippo.combination(self.measure, self.N, 1, S)

        def log_dt_init(rng, shape):
            if self.deterministic:
                return jnp.linspace(math.log(self.dt_min),
                                    math.log(self.dt_max), H)
            u = jax.random.uniform(rng, shape)
            return u * (math.log(self.dt_max) - math.log(self.dt_min)) \
                + math.log(self.dt_min)

        self.log_dt = self.param("log_dt", log_dt_init, (H,))
        self.B = self.param("B", lambda rng, s: jnp.asarray(
            _c2r(B_np)), (S, N2, 2))
        A_real = np.clip(w_np.real, None, -1e-4)
        self.inv_A_real = self.param(
            "inv_A_real", lambda rng, s: jnp.asarray(np.log(-A_real),
                                                     jnp.float32), (S, N2))
        self.A_imag = self.param(
            "A_imag", lambda rng, s: jnp.asarray(w_np.imag, jnp.float32),
            (S, N2))

        def C_init(rng, shape):
            C_raw = jax.random.normal(rng, (self.channels, H, N2),
                                      dtype=jnp.complex64)
            # ref SSKernel line 1240: C = C * repeat(B) for diag mode
            B_rep = jnp.tile(_r2c(jnp.asarray(_c2r(B_np))), (H // S, 1))
            C_raw = C_raw * B_rep
            return jnp.stack([C_raw.real, C_raw.imag], axis=-1)

        self.C = self.param("C", C_init, (self.channels, H, N2, 2))

    def __call__(self, L: int, rate: float = 1.0,
                 state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # ref SSKernelDiag.forward: `assert state is None, "Not implemented"`
        assert state is None, "state is not supported in diag mode"
        H = self.H
        dt = jnp.exp(self.log_dt) * rate                   # (H,)
        C = _r2c(self.C)                                   # (c, H, N2)
        A = jax.lax.complex(-jnp.exp(self.inv_A_real), self.A_imag)
        rep = H // A.shape[0]
        A = jnp.tile(A, (rep, 1))                          # (H, N2)
        B = jnp.tile(_r2c(self.B), (rep, 1))               # (H, N2)
        C = C * B
        if self.bandlimit is not None:
            freqs = dt[:, None] / rate * jnp.abs(A.imag) / (2 * math.pi)
            C = C * jnp.where(freqs < self.bandlimit * 0.5, 1.0, 0.0)
        dtA = A * dt[:, None]

        if self.disc == "zoh":
            Ck = C * (jnp.exp(dtA) - 1.0) / A
            K = log_vandermonde(Ck, dtA, L)
        elif self.disc == "bilinear":
            Ck = C * (1.0 / (1.0 - dtA / 2)) * dt[:, None]
            dA = (1.0 + dtA / 2) / (1.0 - dtA / 2)
            K = log_vandermonde(Ck, jnp.log(dA), L)
        else:
            raise NotImplementedError(self.disc)
        return K                                           # (c, H, L)


class TorchConv1x1(nn.Module):
    """Plain (non-weight-normed) torch Conv1d k=1 with default init."""

    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.w = self.param(
            "w", torch_uniform_init(self.in_channels),
            (self.out_channels, self.in_channels), self.param_dtype)
        self.b = self.param("b", torch_uniform_init(self.in_channels),
                            (self.out_channels,), self.param_dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        eq = "bscr,oc->bsor" if x.ndim == 4 else "bc...,oc->bo..."
        bshape = (1, 1, -1, 1) if x.ndim == 4 else \
            (1, -1) + (1,) * (x.ndim - 2)
        y = jnp.einsum(eq, x.astype(self.dtype), self.w.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        return (y + self.b.astype(jnp.float32).reshape(bshape)
                ).astype(self.dtype)


def _act_fn(name: Optional[str]):
    """Activation registry (ref ``Activation``, models/s4.py:134-160)."""
    if name in (None, "id", "identity", "linear"):
        return lambda x: x
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise NotImplementedError(f"activation {name!r} not implemented")


class S4(nn.Module):
    """S4 layer: SSM global convolution + D skip + activation + output mix.

    Forward parity with ref S4.forward (models/s4.py:1376-1437) including
    the position-wise option surface of the reference constructor
    (models/s4.py:1284-1300): ``activation`` between SSM and output,
    ``postact`` inside the output linear (GLU doubles its width),
    ``hyper_act`` (multiplicative gating with doubled channels), ``linear``
    (drop all pointwise parts), ``shift`` (experimental flipped-causal
    conv), and ``transposed`` ((B, H, L) vs (B, L, H) activations).

    ``kernel=None`` computes the conv kernel from parameters; passing a
    precomputed kernel (from :meth:`compute_kernel` /
    :meth:`compute_kernel_freq` / :meth:`compute_kernel_fact` /
    :meth:`compute_kernel_v2`) skips that work — the sampling loop hoists
    it out of the T-step scan.  ``rate`` resamples the kernel (ref :1388);
    ``state`` runs with an initial SSM state and returns
    ``(y, next_state)`` (NPLR mode only, like the reference).
    """

    d_model: int
    d_state: int = 64
    l_max: int = 1
    channels: int = 1
    bidirectional: bool = False
    mode: str = "nplr"            # 'nplr' (S4) | 'diag' (S4D)
    measure: str = "legs"
    rank: int = 1
    n_ssm: Optional[int] = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    dropout: float = 0.0
    activation: Optional[str] = "gelu"   # between SSM and output linear
    postact: Optional[str] = "glu"       # inside the output linear
    hyper_act: Optional[str] = None      # multiplicative gating
    transposed: bool = True              # (B, H, L) if True else (B, L, H)
    shift: bool = False                  # experimental (ref :1396-1402)
    linear: bool = False                 # drop all pointwise components
    deterministic_init: bool = False
    cauchy: str = "auto"
    kernel_fft_fast: Any = False  # MXU FFT precision in per-step kernel
    #   construction: False / "high" / True (see SSKernelNPLR.fft_fast)
    v2_R: Optional[int] = None    # layout-family R for the fused conv
    #   (threaded from the network top tier so pooled tiers share one
    #   compact layout; None = derive from this layer's own n)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def _c_eff(self) -> int:
        """Channels after hyper doubling (D / conv-output channels)."""
        return self.channels * (2 if self.hyper_act is not None else 1)

    def setup(self):
        H = self.d_model
        c_kernel = self._c_eff * (2 if self.bidirectional else 1)
        if self.mode == "nplr":
            self.kernel = SSKernelNPLR(
                H=H, N=self.d_state, l_max=self.l_max, channels=c_kernel,
                measure=self.measure, rank=self.rank, n_ssm=self.n_ssm,
                dt_min=self.dt_min, dt_max=self.dt_max,
                deterministic=self.deterministic_init, cauchy=self.cauchy,
                fft_fast=self.kernel_fft_fast)
        elif self.mode == "diag":
            self.kernel = SSKernelDiag(
                H=H, N=self.d_state, l_max=self.l_max, channels=c_kernel,
                measure=self.measure if self.measure.startswith("diag")
                else "diag-lin",
                n_ssm=self.n_ssm, dt_min=self.dt_min, dt_max=self.dt_max,
                deterministic=self.deterministic_init)
        else:
            raise NotImplementedError(self.mode)
        self.D = self.param("D", nn.initializers.normal(stddev=1.0),
                            (self._c_eff, H), self.param_dtype)
        if not self.linear:
            d_out = 2 * H if self.postact == "glu" else H
            self.output_linear = TorchConv1x1(
                H * self.channels, d_out, dtype=self.dtype,
                param_dtype=self.param_dtype)

    def _defaults_only(self) -> bool:
        """The fused conv paths bake in the DiffWave epilogue (GELU + GLU,
        transposed, channels=1); exotic constructor options fall back to
        the standard path."""
        return (self.channels == 1 and self.activation == "gelu"
                and self.postact == "glu" and self.hyper_act is None
                and self.transposed and not self.shift and not self.linear)

    def compute_kernel(self, L: int) -> jnp.ndarray:
        """(c_kernel, H, L_kernel) with L_kernel = min(L, l_max) (ref :1388)."""
        L_kernel = L if not self.l_max else min(L, self.l_max)
        return self.kernel(L_kernel)

    def compute_kernel_fact(self, L: int) -> jnp.ndarray:
        """Factorized frequency kernel (2, H, N1, K2) f32 for the FUSED
        Pallas convolution (ops/fftconv_pallas.py) — bidirectional combine
        folded in, c must be 1."""
        assert self._defaults_only(), "fused conv path: default epilogue only"
        k = self.compute_kernel(L)
        L_kernel = k.shape[-1]
        n = _fft_size(L_kernel + L)
        if self.bidirectional:
            k = _combine_bidirectional(k, 1, n)
        return factorize_kernel_freq(k[0], n)

    def v2_layout(self, L: int) -> fftconv2.Layout:
        """Compact layout for the v2 fused conv at generation length L.
        bf16 activations -> bf16 in-kernel temporaries (same numerics
        class, halves the kernel's VMEM frame).  Strict mode
        (fftconv_pallas.set_fast(False)) runs the chain in f32, so the
        layout must budget f32 frames there or HB overflows scoped VMEM."""
        L_kernel = L if not self.l_max else min(L, self.l_max)
        return fftconv2.choose_layout(
            L, _fft_size(L_kernel + L), self.d_model, R=self.v2_R,
            bf16=(self.dtype == jnp.bfloat16
                  and fftconv_pallas.FAST["enabled"]))

    def compute_kernel_v2(self, L: int):
        """(kfr, kfi) c-folded spectrum tiles for the v2 layout-native
        fused convolution (ops/fftconv2.py); bidirectional combine folded."""
        assert self._defaults_only(), "fused conv path: default epilogue only"
        lay = self.v2_layout(L)
        k = self.compute_kernel(L)
        if self.bidirectional:
            k = _combine_bidirectional(k, 1, lay.n)
        return fftconv2.kernel_spectrum(k[0], lay,
                                        fast=self.kernel_fft_fast)

    def compute_kernel_freq(self, L: int) -> jnp.ndarray:
        """Frequency-domain kernel: bidirectional-combined, padded, rfft'd.

        Everything about the convolution kernel — including its FFT — is
        independent of the diffusion step and the input, so the sampling
        scan reuses this across all T steps (the reference recomputes kernel
        AND its FFT in every forward).  Shape (channels, H, n//2+1) c64 with
        n = L_kernel + L.
        """
        k = self.compute_kernel(L)
        L_kernel = k.shape[-1]
        n = _fft_size(L_kernel + L)
        if self.bidirectional:
            k = _combine_bidirectional(k, self.channels, n)
        return _rfft(k.astype(jnp.float32), n)

    def _postact(self, y: jnp.ndarray) -> jnp.ndarray:
        """Output linear + postact (ref LinearActivation, models/s4.py:
        163-177): GLU doubles the linear width and gates over channels.
        Channel axis: 1 for flat (B, C, L), 2 for compact (B, S, C, Rc)."""
        y = self.output_linear(y)
        if self.postact == "glu":
            a, b = jnp.split(y, 2, axis=2 if y.ndim == 4 else 1)
            return a * jax.nn.sigmoid(b)                   # GLU(dim=-2)
        return _act_fn(self.postact)(y)

    def _dropout_nd(self, y: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.dropout > 0.0 and train:
            # DropoutNd: mask tied across the sequence length (ref :179-199);
            # per (batch, channel) — channel is dim 2 in the compact layout
            keep = 1.0 - self.dropout
            mshape = ((y.shape[0], 1, y.shape[2], 1) if y.ndim == 4
                      else y.shape[:2] + (1,) * (y.ndim - 2))
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                        mshape)
            y = y * mask / keep
        return y

    def __call__(self, u: jnp.ndarray, kernel=None, train: bool = False,
                 rate: float = 1.0, state: Optional[jnp.ndarray] = None,
                 residual: Optional[jnp.ndarray] = None,
                 prologue=None):
        """u: (B, H, L) -> (B, H, L) (or (B, L, H) with transposed=False).

        ``kernel`` may be a time-domain kernel from :meth:`compute_kernel`
        (real, 3-dim), a frequency-domain kernel from
        :meth:`compute_kernel_freq` (complex), a factorized kernel from
        :meth:`compute_kernel_fact` (real, 4-dim -> v1 fused Pallas conv),
        or a (kfr, kfi) pair from :meth:`compute_kernel_v2` with ``u`` in
        compact (B, H, S, Rc) layout -> v2 layout-native fused conv.

        With ``state`` (an initial SSM state, (B, H, N/2) complex), returns
        ``(y, next_state)`` like the reference (models/s4.py:1414-1420);
        otherwise returns ``y`` alone.
        """
        # ---- v2 compact-layout fused path (kernel = (kfr, kfi) pair) ----
        if isinstance(kernel, (tuple, list)):
            assert u.ndim == 4 and state is None and rate == 1.0
            kfr, kfi = kernel
            lay = self.v2_layout(self.l_max)
            assert u.shape[1] == lay.S and u.shape[3] == lay.Rc, \
                (u.shape, lay)
            fast = fftconv_pallas.FAST["enabled"]
            if not train:
                # conv + D-skip + exact GELU fused in-kernel; with
                # `prologue` the block head (norm1 + step bias) rides
                # along as a per-position scale/shift + channel bias
                if prologue is not None:
                    a, c, bias = prologue
                    y = fftconv2.fftconv2_ln_bias_gelu_d(
                        u, a, c, bias, kfr, kfi,
                        self.D[0].astype(jnp.float32), lay, fast)
                else:
                    y = fftconv2.fftconv2_gelu_d(
                        u, kfr, kfi, self.D[0].astype(jnp.float32), lay,
                        fast)
                if residual is not None:
                    # fused output linear + GLU + block residual in one
                    # HBM pass (ops/chmix); v2 kernels imply the default
                    # epilogue (postact == 'glu')
                    from ..ops import chmix
                    return chmix.mix_glu_res(
                        y.astype(self.dtype), residual,
                        self.output_linear.w, self.output_linear.b, fast)
            else:
                y = fftconv2.fftconv2(u, kfr, kfi, lay, fast)
                # checkpoint_name: under the block remat's
                # save-named-outputs policy (models/sashimi._make_stack)
                # the conv output is SAVED, so the backward recompute is
                # norm1/bias/GELU elementwise only — the four-matmul conv
                # fwd does not run twice
                y = jax.ad_checkpoint.checkpoint_name(y, "conv_out")
                # + D*u on the channel-inner layout (channel at dim 2)
                y = y + (self.D[0].astype(self.dtype)[None, None, :, None]
                         * u)
                y = jax.nn.gelu(y, approximate=False)
                y = self._dropout_nd(y, train)
                if residual is not None:
                    # differentiable fused output linear + GLU + residual
                    # (hand-written backward kernel, ops/chmix)
                    assert self.dropout == 0.0
                    from ..ops import chmix
                    return jax.ad_checkpoint.checkpoint_name(
                        chmix.mix_glu_res_train(
                            y.astype(self.dtype), residual,
                            self.output_linear.w, self.output_linear.b,
                            fast), "glu_out")
            return self._postact(y.astype(self.dtype))

        if not self.transposed:
            u = jnp.swapaxes(u, -1, -2)
        L = u.shape[-1]

        next_state = None
        k_state = None
        if state is not None:
            assert not self.bidirectional, \
                "Bidirectional not supported with state forwarding"
            assert kernel is None, "state requires in-layer kernel compute"

        # ---- v1 fused Pallas path (factorized 4-dim real kernel) ----
        if kernel is not None and not jnp.iscomplexobj(kernel) \
                and getattr(kernel, "ndim", 0) == 4:
            L_kernel = L if not self.l_max else min(L, self.l_max)
            n = _fft_size(L_kernel + L)
            y = fftconv_fused(u.astype(jnp.float32), kernel, n, L,
                              fftconv_pallas.FAST["enabled"])
            y = y[:, None]                                 # (B, 1, H, L)
            u32 = u.astype(jnp.float32)
            y = y + jnp.einsum("bhl,ch->bchl", u32,
                               self.D.astype(jnp.float32))
            y = y.reshape(y.shape[0], -1, L).astype(self.dtype)
            y = jax.nn.gelu(y, approximate=False)
            y = self._dropout_nd(y, train)
            return self._postact(y)

        # ---- standard path (full option surface) ----
        if kernel is not None and jnp.iscomplexobj(kernel):
            k_f = kernel                                   # (c, H, n/2+1)
            L_kernel = L if not self.l_max else min(L, self.l_max)
            k = None
        else:
            # ref :1388: L_kernel = min(L, round(self.L / rate))
            L_kernel = L if not self.l_max \
                else min(L, int(round(self.l_max / rate)))
            if kernel is None:
                if state is not None:
                    k, k_state_k = self.kernel(L_kernel, rate=rate,
                                               state=state)
                else:
                    k = self.kernel(L_kernel, rate=rate)
            else:
                k = kernel
            L_kernel = k.shape[-1]
            k_f = None

        u32 = u.astype(jnp.float32)
        if self.shift and k is not None:
            # experimental shifted conv (ref models/s4.py:1396-1402),
            # implemented literally: rfft at 2L of left-padded flips,
            # irfft truncated to L_kernel + L bins, tail flipped back.
            # Only well-formed when L_kernel == L (as in the reference).
            assert not self.bidirectional, "shift + bidirectional unsupported"
            assert L_kernel == L, "shift requires L_kernel == L"
            n2 = 2 * L
            pad = ((0, 0),) * (k.ndim - 1) + ((L, 0),)
            k_f = jnp.fft.rfft(
                jnp.pad(jnp.flip(k, -1).astype(jnp.float32), pad), n=n2)
            u_f = jnp.fft.rfft(jnp.pad(jnp.flip(u32, -1), pad), n=n2)
            y_f = jnp.einsum("bhl,chl->bchl", u_f, k_f)
            m = L_kernel + L
            y = jnp.fft.irfft(y_f[..., : m // 2 + 1], n=m)[..., L:]
            y = jnp.flip(y, -1)
        else:
            if k_f is None:
                if self.bidirectional:
                    k = _combine_bidirectional(k, self._c_eff,
                                               _fft_size(L_kernel + L))
                k_f = _rfft(k.astype(jnp.float32), _fft_size(L_kernel + L))
            n = _fft_size(L_kernel + L)
            u_f = _rfft(u32, n)                            # (B, H, n/2+1)
            if k_f.shape[0] == 1:
                y_f = (u_f * k_f[0])[:, None]              # (B, 1, H, ...)
            else:
                y_f = jnp.einsum("bhl,chl->bchl", u_f, k_f)
            y = _irfft(y_f, n)[..., :L]                    # (B, c, H, L)

        y = y + jnp.einsum("bhl,ch->bchl", u32, self.D.astype(jnp.float32))

        if state is not None:
            y = y + k_state_k.astype(y.dtype)              # (B, c, H, L)
            next_state = self.kernel.forward_state(u32, state)

        if self.hyper_act is not None:
            # y (B, 2c, H, L) -> gate * value (ref :1423-1425)
            y2 = y.reshape(y.shape[0], 2, self.channels, *y.shape[2:])
            y = _act_fn(self.hyper_act)(y2[:, 1]) * y2[:, 0]

        y = y.reshape(y.shape[0], -1, L).astype(self.dtype)  # (B, c*H, L)

        if not self.linear:
            y = _act_fn(self.activation)(y)
            y = self._dropout_nd(y, train)
            y = self._postact(y)

        if not self.transposed:
            y = jnp.swapaxes(y, -1, -2)
        if state is not None:
            return y, next_state
        return y
