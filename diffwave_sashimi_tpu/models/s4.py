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
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import hippo
from ..ops.cauchy import cauchy_sym
from ..ops.cauchy_pallas import cauchy_sym_pallas, MAX_BWD_L
from ..ops.vandermonde import log_vandermonde
from ..ops.nplr import discretize, setup_C, extend_C
from ..ops.conv import torch_uniform_init
from ..ops import mxu_fft
from ..ops import fftconv_pallas
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

    def __call__(self, L: int, rate: float = 1.0) -> jnp.ndarray:
        """Compute the length-L convolution kernel, shape (channels, H, L).

        Mirrors ref SSKernelNPLR.forward (models/s4.py:674-822) with
        state=None.  ``L`` may exceed ``l_max``; the C~ doubling is then done
        functionally on the fly.
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

        if L > internal_L:
            dA, _ = discretize(w, P, B[0], dt)
            C, internal_L = extend_C(C, dA, internal_L, L)
        discrete_L = int(round(internal_L / rate))

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
        k = jnp.fft.irfft(k_f, n=discrete_L)               # (1, c, H, L)
        return k[0, :, :, :L]


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

    def __call__(self, L: int, rate: float = 1.0) -> jnp.ndarray:
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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w", torch_uniform_init(self.in_channels),
                       (self.out_channels, self.in_channels), self.param_dtype)
        b = self.param("b", torch_uniform_init(self.in_channels),
                       (self.out_channels,), self.param_dtype)
        y = jnp.einsum("bcl,oc->bol", x.astype(self.dtype),
                       w.astype(self.dtype), preferred_element_type=jnp.float32)
        return (y + b.astype(jnp.float32)[None, :, None]).astype(self.dtype)


class S4(nn.Module):
    """S4 layer: SSM global convolution + D skip + GELU + GLU output mix.

    Forward parity with ref S4.forward (models/s4.py:1376-1437), transposed
    layout (B, H, L).  ``kernel=None`` computes the conv kernel from
    parameters; passing a precomputed kernel (from :meth:`compute_kernel`)
    skips that work — the sampling loop hoists it out of the T-step scan.
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
    deterministic_init: bool = False
    cauchy: str = "auto"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        H = self.d_model
        c_kernel = self.channels * (2 if self.bidirectional else 1)
        if self.mode == "nplr":
            self.kernel = SSKernelNPLR(
                H=H, N=self.d_state, l_max=self.l_max, channels=c_kernel,
                measure=self.measure, rank=self.rank, n_ssm=self.n_ssm,
                dt_min=self.dt_min, dt_max=self.dt_max,
                deterministic=self.deterministic_init, cauchy=self.cauchy)
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
                            (self.channels, H), self.param_dtype)
        self.output_linear = TorchConv1x1(
            H * self.channels, 2 * H, dtype=self.dtype,
            param_dtype=self.param_dtype)

    def compute_kernel(self, L: int) -> jnp.ndarray:
        """(c_kernel, H, L_kernel) with L_kernel = min(L, l_max) (ref :1388)."""
        L_kernel = L if not self.l_max else min(L, self.l_max)
        return self.kernel(L_kernel)

    def compute_kernel_fact(self, L: int) -> jnp.ndarray:
        """Factorized frequency kernel (2, H, N1, K2) f32 for the FUSED
        Pallas convolution (ops/fftconv_pallas.py) — bidirectional combine
        folded in, c must be 1."""
        assert self.channels == 1, "fused conv path supports channels=1"
        k = self.compute_kernel(L)
        L_kernel = k.shape[-1]
        n = _fft_size(L_kernel + L)
        if self.bidirectional:
            k = _combine_bidirectional(k, 1, n)
        return factorize_kernel_freq(k[0], n)

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

    def __call__(self, u: jnp.ndarray, kernel: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        """u: (B, H, L) -> (B, H, L).

        ``kernel`` may be a time-domain kernel from :meth:`compute_kernel`
        (real) or a precomputed frequency-domain kernel from
        :meth:`compute_kernel_freq` (complex) — dispatched on dtype.
        """
        L = u.shape[-1]
        if kernel is not None and not jnp.iscomplexobj(kernel) \
                and kernel.ndim == 4:
            # factorized kernel -> fully fused Pallas FFT-convolution
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
            if self.dropout > 0.0 and train:
                keep = 1.0 - self.dropout
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, y.shape[:2] + (1,))
                y = y * mask / keep
            y = self.output_linear(y)
            a, b = jnp.split(y, 2, axis=1)
            return a * jax.nn.sigmoid(b)
        if kernel is not None and jnp.iscomplexobj(kernel):
            k_f = kernel                                   # (c, H, n/2+1)
            L_kernel = L if not self.l_max else min(L, self.l_max)
        else:
            k = self.compute_kernel(L) if kernel is None else kernel
            L_kernel = k.shape[-1]
            if self.bidirectional:
                k = _combine_bidirectional(k, self.channels,
                                           _fft_size(L_kernel + L))
            k_f = _rfft(k.astype(jnp.float32), _fft_size(L_kernel + L))

        n = _fft_size(L_kernel + L)
        u32 = u.astype(jnp.float32)
        u_f = _rfft(u32, n)                                # (B, H, n/2+1)
        if k_f.shape[0] == 1:
            y_f = (u_f * k_f[0])[:, None]                  # (B, 1, H, n/2+1)
        else:
            y_f = jnp.einsum("bhl,chl->bchl", u_f, k_f)
        y = _irfft(y_f, n)[..., :L]                        # (B, c, H, L)

        y = y + jnp.einsum("bhl,ch->bchl", u32, self.D.astype(jnp.float32))
        y = y.reshape(y.shape[0], -1, L).astype(self.dtype)  # (B, c*H, L)

        y = jax.nn.gelu(y, approximate=False)
        if self.dropout > 0.0 and train:
            # DropoutNd: mask tied across the sequence length (ref :179-199)
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, y.shape[:2] + (1,))
            y = y * mask / keep
        y = self.output_linear(y)                          # (B, 2H, L)
        a, b = jnp.split(y, 2, axis=1)
        return a * jax.nn.sigmoid(b)                       # GLU(dim=-2)
