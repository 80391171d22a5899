#!/usr/bin/env python
"""On-chip validation: numerics of every custom compute path vs oracles.

Run on the real TPU (the pytest suite runs on CPU by design; this script is
the hardware-side complement). Checks, each against an independent oracle:

  1. MXU four-step rfft/irfft vs numpy FFT
  2. Pallas symmetric-Cauchy kernel (compiled) vs the XLA formulation
  3. Fused FFT-convolution kernel vs numpy conv theorem
  4. A full S4 forward vs CPU-computed reference values

Exits nonzero on any failure; prints one line per check.
"""

import sys

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FAILURES = []


def dev_rel_err(out_dev, ref_np):
    """Relative max-error computed ON DEVICE; only a real f32 scalar does
    the device->host trip, and complex references are shipped as separate
    real/imag planes (complex H2D AND D2H are UNIMPLEMENTED on axon)."""
    if np.iscomplexobj(ref_np):
        rr = jnp.asarray(np.ascontiguousarray(ref_np.real), jnp.float32)
        ri = jnp.asarray(np.ascontiguousarray(ref_np.imag), jnp.float32)
        diff = jnp.sqrt((jnp.real(out_dev) - rr) ** 2
                        + (jnp.imag(out_dev) - ri) ** 2)
        scale = jnp.max(jnp.sqrt(rr ** 2 + ri ** 2))
    else:
        ref = jnp.asarray(np.asarray(ref_np, np.float32))
        diff = jnp.abs(out_dev.astype(jnp.float32) - ref)
        scale = jnp.max(jnp.abs(ref))
    return float(jnp.max(diff) / (scale + 1e-12))


def to_dev_complex(a_np):
    """Upload complex data as two f32 planes (complex H2D unsupported)."""
    return jax.lax.complex(
        jnp.asarray(np.ascontiguousarray(a_np.real), jnp.float32),
        jnp.asarray(np.ascontiguousarray(a_np.imag), jnp.float32))


def check(name, err, tol):
    ok = err < tol
    print(f"{'OK ' if ok else 'FAIL'} {name}: err={err:.2e} (tol {tol:.0e})",
          flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}",
          flush=True)
    rng = np.random.RandomState(0)

    # 1. MXU FFT
    from diffwave_sashimi_tpu.ops.mxu_fft import rfft_mxu, irfft_mxu
    n, L = 32768, 16000
    x = rng.randn(4, 32, L).astype(np.float32)
    ref = np.fft.rfft(x, n=n).astype(np.complex64)
    out = rfft_mxu(jnp.asarray(x), n)
    check("rfft_mxu n=32768", dev_rel_err(out, ref), 1e-4)
    xi = irfft_mxu(to_dev_complex(ref), n)
    xi_ref = np.fft.irfft(ref, n=n).astype(np.float32)
    check("irfft_mxu n=32768", dev_rel_err(xi, xi_ref), 1e-4)

    # 2. Pallas Cauchy (compiled) vs an f64 HOST oracle. (Comparing against
    # the XLA matmul formulation is misleading on TPU: its complex einsums
    # run as bf16 MXU matmuls under default precision, ~2.5e-3 error.)
    from diffwave_sashimi_tpu.ops.cauchy_pallas import cauchy_sym_pallas
    H, N, Lz = 32, 32, 2001
    v_np = (rng.randn(2, 3, H, N) + 1j * rng.randn(2, 3, H, N)).astype(np.complex64)
    w_np = (-np.abs(rng.randn(H, N)) + 1j * rng.randn(H, N)).astype(np.complex64)
    z_np = (1j * rng.randn(Lz)).astype(np.complex64)
    vv = np.concatenate([v_np, v_np.conj()], -1).astype(np.complex128)
    ww = np.concatenate([w_np, w_np.conj()], -1).astype(np.complex128)
    oracle = (vv[..., None] / (z_np.astype(np.complex128) - ww[..., None])
              ).sum(-2).astype(np.complex64)
    r_p = jax.jit(cauchy_sym_pallas)(to_dev_complex(v_np),
                                     to_dev_complex(z_np),
                                     to_dev_complex(w_np))
    check("pallas cauchy vs f64 oracle", dev_rel_err(r_p, oracle), 1e-4)

    # 3. Fused conv vs numpy conv theorem
    from diffwave_sashimi_tpu.ops.fftconv_pallas import (fftconv_fused,
                                                         factorize_kernel_freq)
    B, Hc, Lc, nc = 4, 32, 4000, 8192
    u = rng.randn(B, Hc, Lc).astype(np.float32)
    k = (rng.randn(Hc, Lc) * np.exp(-np.arange(Lc) / 500)).astype(np.float32)
    kf = factorize_kernel_freq(jnp.asarray(k), nc)
    y = jax.jit(lambda uu: fftconv_fused(uu, kf, nc, Lc, True))(
        jnp.asarray(u))
    Y = np.fft.rfft(u, n=nc) * np.fft.rfft(k, n=nc)
    y_ref = np.fft.irfft(Y, n=nc)[..., :Lc].astype(np.float32)
    check("fused conv (bf16 MXU) vs numpy", dev_rel_err(y, y_ref), 2e-2)

    # 4. S4 forward vs CPU-computed reference (the CPU instance pins
    # cauchy='xla': the 'auto' dispatch keys off the GLOBAL default backend,
    # which is the TPU even when arrays live on the host CPU device)
    from diffwave_sashimi_tpu.models.s4 import S4
    mod_cpu = S4(d_model=16, d_state=16, l_max=512, bidirectional=True,
                 cauchy="xla")
    mod_tpu = S4(d_model=16, d_state=16, l_max=512, bidirectional=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = mod_cpu.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 512)))
        u_s4 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 512))
        y_cpu = np.asarray(mod_cpu.apply(params, u_s4))
    y_tpu = jax.jit(mod_tpu.apply)(jax.device_put(params),
                                   jax.device_put(u_s4))
    check("S4 forward TPU vs CPU", dev_rel_err(y_tpu, y_cpu), 1e-2)

    # 5. init-time matrix powers vs f64 oracle: dA^L at DEFAULT precision
    # (bf16 MXU) once made on-TPU C~ inits untrainable garbage — ops/nplr
    # pins HIGHEST; this guards the pin on real hardware
    from diffwave_sashimi_tpu.ops.nplr import matrix_power
    rngp = np.random.RandomState(5)
    # contractive random A (like dA): spectral radius < 1
    Araw = (rngp.randn(4, 32, 32) + 1j * rngp.randn(4, 32, 32)) / 32
    A = Araw * 0.9998 / np.abs(np.linalg.eigvals(Araw)).max()
    AL_ref = np.linalg.matrix_power(A.astype(np.complex128), 16000)
    # complex H2D is UNIMPLEMENTED on this backend: ship planes
    AL = jax.jit(lambda ar, ai: (lambda m: jnp.stack([m.real, m.imag]))(
        matrix_power(16000, jax.lax.complex(ar, ai))))(
        jnp.asarray(A.real.astype(np.float32)),
        jnp.asarray(A.imag.astype(np.float32)))
    AL_np = np.asarray(AL[0]) + 1j * np.asarray(AL[1])
    err = np.abs(AL_np - AL_ref).max() / max(np.abs(AL_ref).max(), 1e-12)
    check("init matrix_power dA^16000 vs f64", err, 1e-3)

    # 6. Opt-in int8 MXU conv stages, COMPILED path (the interpret-mode
    # pin lives in test_fftconv2.py::test_conv2_int8_interpret; this line
    # keeps the compiled TPU path from silently rotting — it is default-off
    # and otherwise only exercised by manual scripts/int8_check.py runs).
    from diffwave_sashimi_tpu.ops import fftconv2 as f2
    from scipy.special import erf as _erf
    Li, ni, Hi, Bi = 1000, 2048, 16, 2
    lay = f2.choose_layout(Li, ni, Hi)
    u8 = rng.randn(Bi, Hi, Li).astype(np.float32)
    k8 = (rng.randn(Hi, ni) * 0.3).astype(np.float32)
    y8_ref = np.fft.irfft(np.fft.rfft(u8, n=ni) * np.fft.rfft(k8, n=ni),
                          n=ni)[..., :Li]
    y8_ref = y8_ref * 0.5 * (1 + _erf(y8_ref / np.sqrt(2)))   # exact GELU
    kfr, kfi = f2.kernel_spectrum(jnp.asarray(k8), lay)
    uc = f2.to_compact(jnp.asarray(u8), lay)
    d0 = jnp.zeros((Hi,), jnp.float32)
    f2.set_int8(True)
    try:
        yc = jax.jit(lambda a, b, c: f2.fftconv2_gelu_d(a, b, c, d0, lay))(
            uc, kfr, kfi)
        y8 = f2.from_compact(yc, lay, Li)
        check("int8 conv stages (compiled) vs f64 oracle",
              dev_rel_err(y8, y8_ref), 3e-2)
    finally:
        f2.set_int8(False)

    if FAILURES:
        print(f"FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("all on-chip checks passed", flush=True)


if __name__ == "__main__":
    main()
