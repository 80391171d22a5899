"""Account for the sampling step time kernel-by-kernel: measure each fused
kernel at its real tier shape x its per-step count and compare the sum to
the measured end-to-end step (sashimi d128 B16).

Step composition (d_model=128, n_layers=6, pool (4,4), unet):
  tier1 H=128 L=16000 S=128: 12 blocks,  tier2 H=256 L=4000 S=32: 12,
  tier3 H=512 L=1000  S=8:    6 blocks.
Per block: stats (XLA reduce) + conv[ln_bias_gelu_d] + glu_res + ln_ff.
"""

import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffwave_sashimi_tpu.ops import chmix, fftconv2 as f2  # noqa: E402

B = 16
REPS = 30
TIERS = [  # (H, L, n, S, blocks)
    (128, 16000, 32768, 128, 12),
    (256, 4000, 8192, 32, 12),
    (512, 1000, 2048, 8, 6),
]


def slope(fn, *args):
    o = fn(*args)
    float(o.sum().astype(jnp.float32))

    def timed(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(o.sum().astype(jnp.float32))
        return time.time() - t0

    t1 = timed(3)
    tn = timed(3 + REPS)
    return (tn - t1) / REPS


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)
    total = 0.0
    for (H, L, n, S, nblocks) in TIERS:
        lay = f2.choose_layout(L, n, H, bf16=True)
        Rc = lay.Rc
        x = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * .3,
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(H, n).astype(np.float32) * .02)
        kfr, kfi = jax.jit(lambda kk, lay=lay: f2.kernel_spectrum(kk, lay))(k)
        d = jnp.asarray(rng.randn(H).astype(np.float32))
        a = jnp.asarray(rng.rand(B, S, Rc).astype(np.float32) + 0.5)
        c = jnp.asarray(rng.randn(B, S, Rc).astype(np.float32) * .1)
        bias = jnp.asarray(rng.randn(B, H).astype(np.float32) * .1)
        w = jnp.asarray(rng.randn(2 * H, H).astype(np.float32) * .05)
        bb = jnp.asarray(rng.randn(2 * H).astype(np.float32) * .1)
        w2 = jnp.asarray(rng.randn(H, 2 * H).astype(np.float32) * .05)
        b2 = jnp.asarray(rng.randn(H).astype(np.float32) * .1)
        m1 = jnp.zeros((1,), jnp.float32)
        s1 = jnp.ones((1,), jnp.float32)

        @jax.jit
        def f_stats(x):
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=2)
            var = jnp.var(x32, axis=2)
            aa = jax.lax.rsqrt(var)
            return (0.0 - mean) * aa

        @jax.jit
        def f_conv(x, a, c, bias, kfr, kfi, d, lay=lay):
            return f2.fftconv2_ln_bias_gelu_d(x, a, c, bias, kfr, kfi, d,
                                              lay, True)

        @jax.jit
        def f_glu(y, r, w, bb):
            return chmix.mix_glu_res(y, r, w, bb, True)

        @jax.jit
        def f_ff(x, m1, s1, w, bb, w2, b2):
            return chmix.ln_ff_res(x, m1, s1, w, bb, w2, b2, True)

        ts = slope(f_stats, x) * 1e3
        tc = slope(f_conv, x, a, c, bias, kfr, kfi, d) * 1e3
        tg = slope(f_glu, x, x, w, bb) * 1e3
        tf = slope(f_ff, x, m1, s1, w, bb, w2, b2) * 1e3
        blk = ts + tc + tg + tf
        total += blk * nblocks
        gfc = B * H * 8 * lay.n * (lay.Rc + lay.S) / 1e9
        print(f"H={H:3d}: stats {ts:5.2f}  conv {tc:5.2f} "
              f"({gfc/tc:4.0f} GF/ms) glu {tg:5.2f}  ff {tf:5.2f} "
              f"| block {blk:5.2f} ms x{nblocks}", flush=True)
    print(f"sum over blocks: {total:.1f} ms (step measured ~76.6 ms)",
          flush=True)


if __name__ == "__main__":
    main()
