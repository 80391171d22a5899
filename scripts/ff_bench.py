#!/usr/bin/env python
"""Microbench: 1x1-conv (channel matmul) formulations on compact-layout
activations, plus fused-conv per-tier configs at model dtypes.

Finds the fastest way to run the FF/GLU channel mixes that dominate the
non-conv part of the sampling step (see scripts/rest_ablation.py).
"""

import time

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffwave_sashimi_tpu.ops import fftconv2 as f2  # noqa: E402

B = 16
TIERS = [(128, 128, 128), (256, 32, 128), (512, 8, 128)]  # (H, S, Rc)
REPS = 20


def slope(fn, *args):
    o = fn(*args)
    float(o.sum().astype(jnp.float32))

    def timed(k):
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        float(o.sum().astype(jnp.float32))
        return time.time() - t0

    t1 = timed(1)
    tn = timed(1 + REPS)
    return (tn - t1) / REPS


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)
    for (H, S, Rc) in TIERS:
        x = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * .1,
                        jnp.bfloat16)
        w = jnp.asarray(rng.randn(2 * H, H).astype(np.float32) * .05,
                        jnp.bfloat16)
        gf = 2 * B * S * Rc * H * 2 * H / 1e9

        @jax.jit
        def f_einsum(x, w):
            return jnp.einsum("bscr,oc->bsor", x, w,
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)

        @jax.jit
        def f_hmajor(x, w):
            # transpose to H-major, one big GEMM, transpose back
            xt = jnp.transpose(x, (2, 0, 1, 3)).reshape(H, -1)
            y = jnp.dot(w, xt, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            return jnp.transpose(y.reshape(2 * H, B, S, Rc), (1, 2, 0, 3))

        @jax.jit
        def f_dotgen(x, w):
            # contraction over dim 2 with no batch dims -> (B,S,Rc,O)
            y = jax.lax.dot_general(
                x, w, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return jnp.transpose(y, (0, 1, 3, 2))

        for name, fn in (("einsum", f_einsum), ("hmajor", f_hmajor),
                         ("dotgen", f_dotgen)):
            try:
                t = slope(fn, x, w)
                print(f"H={H:4d} {name:8s}: {t*1e3:6.2f} ms "
                      f"({gf/t/1e3:5.0f} TFLOP/s)", flush=True)
            except Exception as e:
                print(f"H={H:4d} {name}: FAILED {type(e).__name__}",
                      flush=True)

    # conv per-tier at model dtypes (bf16 activations, gelu_d epilogue)
    print("--- fused conv, bf16 activations + gelu_d ---", flush=True)
    for (H, L, n) in [(128, 16000, 32768), (256, 4000, 8192),
                      (512, 1000, 2048)]:
        for HB in (None, 8, 16, 32, 64):
            try:
                lay = f2.choose_layout(L, n, H, HB=HB, bf16=True)
                if HB is not None and lay.HB != HB:
                    continue
                k = jnp.asarray(rng.randn(H, n).astype(np.float32) * .02)
                kfr, kfi = jax.jit(
                    lambda kk, lay=lay: f2.kernel_spectrum(kk, lay))(k)
                d = jnp.asarray(rng.randn(H).astype(np.float32))
                u = jnp.asarray(
                    rng.randn(B, lay.S, H, lay.Rc).astype(np.float32) * .1,
                    jnp.bfloat16)

                @jax.jit
                def fc(u, kfr=kfr, kfi=kfi, d=d, lay=lay):
                    return f2.fftconv2_gelu_d(u, kfr, kfi, d, lay, True)

                t = slope(fc, u)
                gfc = B * H * 8 * lay.n * (lay.Rc + lay.S) / 1e9
                print(f"conv H={H:4d} HB={lay.HB:3d}: {t*1e3:6.2f} ms "
                      f"({gfc/t/1e3:5.0f} TFLOP/s)", flush=True)
            except Exception as e:
                print(f"conv H={H} HB={HB}: FAILED {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()


def bb_sweep():
    """BB (independent batch chains per program) sweep at model dtypes."""
    rng = np.random.RandomState(0)
    print("--- BB interleave sweep (bf16 + gelu_d) ---", flush=True)
    for (H, L, n) in [(128, 16000, 32768), (256, 4000, 8192),
                      (512, 1000, 2048)]:
        for (HB, BB) in ((None, 1), (4, 2), (8, 2), (16, 2), (8, 4)):
            try:
                lay = f2.choose_layout(L, n, H, HB=HB, bf16=True, BB=BB)
                k = jnp.asarray(rng.randn(H, n).astype(np.float32) * .02)
                kfr, kfi = jax.jit(
                    lambda kk, lay=lay: f2.kernel_spectrum(kk, lay))(k)
                d = jnp.asarray(rng.randn(H).astype(np.float32))
                u = jnp.asarray(
                    rng.randn(B, lay.S, H, lay.Rc).astype(np.float32) * .1,
                    jnp.bfloat16)

                @jax.jit
                def fc(u, kfr=kfr, kfi=kfi, d=d, lay=lay):
                    return f2.fftconv2_gelu_d(u, kfr, kfi, d, lay, True)

                t = slope(fc, u)
                gfc = B * H * 8 * lay.n * (lay.Rc + lay.S) / 1e9
                print(f"conv H={H:4d} HB={lay.HB:3d} BB={lay.BB}: "
                      f"{t*1e3:6.2f} ms ({gfc/t/1e3:5.0f} TFLOP/s)",
                      flush=True)
            except Exception as e:
                print(f"conv H={H} HB={HB} BB={BB}: FAILED "
                      f"{type(e).__name__}: {str(e)[:70]}", flush=True)
