#!/usr/bin/env python
"""Microbenchmark of the fused S4 convolution kernels on the real TPU.

Compares, at the three SaShiMi d128 tiers (B=16):
  - v1 per-row kernel (ops/fftconv_pallas.fftconv_fused, fast=True)
  - v2 layout-native channel-inner kernel (ops/fftconv2) over a small
    (R, HB, bf16-temps) sweep
plus the fused gelu_d epilogue and batch scaling at the top tier.

Slope-timed with forced D2H (CLAUDE.md facts 5/13): time(K runs + D2H) for
K=1 and K=1+REPS; the difference isolates per-run device time.
"""

import sys
import time

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffwave_sashimi_tpu.ops import fftconv2 as f2  # noqa: E402
from diffwave_sashimi_tpu.ops import fftconv_pallas as f1  # noqa: E402

TIERS = [  # (H, L, n) for sashimi d128 pool=(4,4) expand=2
    (128, 16000, 32768),
    (256, 4000, 8192),
    (512, 1000, 2048),
]
REPS = 8


def slope_time(fn, x):
    out = fn(x)
    float(out.sum())  # compile + warm

    def timed(k):
        o = x
        t0 = time.time()
        for _ in range(k):
            o = fn(o)
        float(o.sum())
        return time.time() - t0

    t1 = timed(1)
    tn = timed(1 + REPS)
    return (tn - t1) / REPS


def bench_v1(B, H, L, n):
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(H, n).astype(np.float32) * 0.05)
    kf = f1.factorize_kernel_freq(k, n)
    u = jnp.asarray(rng.randn(B, H, L).astype(np.float32) * 0.1)

    @jax.jit
    def fn(x):
        return f1.fftconv_fused(x, kf, n, L, True)

    return slope_time(fn, u)


def bench_v2(B, H, L, n, R=None, HB=None, bf16=False, fused_post=False,
             dtype=jnp.float32):
    lay = f2.choose_layout(L, n, H, R=R, HB=HB, bf16=bf16)
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(H, n).astype(np.float32) * 0.05)
    kfr, kfi = jax.jit(lambda kk: f2.kernel_spectrum(kk, lay))(k)
    u = jnp.asarray(rng.randn(B, H, L).astype(np.float32) * 0.1)
    uc = jax.jit(lambda x: f2.to_compact(x, lay).astype(dtype))(u)
    d = jnp.asarray(rng.randn(H).astype(np.float32))

    if fused_post:
        @jax.jit
        def fn(x):
            return f2.fftconv2_gelu_d(x, kfr, kfi, d, lay, True) * 0.1
    else:
        @jax.jit
        def fn(x):
            return f2.fftconv2(x, kfr, kfi, lay, True)

    return slope_time(fn, uc), lay


def gflop_v2(B, H, lay):
    per_ch = 8 * lay.n * (lay.Rc + lay.S)
    return B * H * per_ch / 1e9


def run(tag, fn, *a, **kw):
    try:
        t, lay = fn(*a, **kw)
        B, H = a[0], a[1]
        gf = gflop_v2(B, H, lay)
        print(f"{tag:34s} R={lay.R:3d} S={lay.S:3d} Rc={lay.Rc:3d} "
              f"HB={lay.HB:2d}: {t*1e3:7.2f} ms "
              f"({gf/t/1e3:5.0f} TFLOP/s)", flush=True)
        return t
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}",
              file=sys.stderr, flush=True)
        return None


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    B = 16
    for (H, L, n) in TIERS:
        t1 = bench_v1(B, H, L, n)
        print(f"v1      H={H:4d} L={L:6d} n={n:6d} B={B}: {t1*1e3:7.2f} ms",
              flush=True)
        run(f"v2 def H={H}", bench_v2, B, H, L, n)
        run(f"v2 bf16 H={H}", bench_v2, B, H, L, n, bf16=True)
        run(f"v2 bf16act H={H}", bench_v2, B, H, L, n, bf16=True,
            dtype=jnp.bfloat16)
    H, L, n = TIERS[0]
    run("v2 top R=128", bench_v2, B, H, L, n, R=128)
    run("v2 top R=512", bench_v2, B, H, L, n, R=512)
    run("v2 top HB=16 bf16", bench_v2, B, H, L, n, HB=16, bf16=True)
    run("v2 top gelu_d", bench_v2, B, H, L, n, fused_post=True)
    run("v2 top B=64", bench_v2, 64, H, L, n)
    H, L, n = TIERS[2]
    run("v2 t3 HB=128 bf16", bench_v2, B, H, L, n, HB=128, bf16=True)
    run("v2 t3 R=256", bench_v2, B, H, L, n, R=256)


if __name__ == "__main__":
    main()
