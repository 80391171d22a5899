"""On-chip validation + timing of the fused channel-mix kernels
(ops/chmix) vs their XLA references, at the SaShiMi d128 tier shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffwave_sashimi_tpu.ops import chmix
from diffwave_sashimi_tpu import utils

utils.enable_compile_cache()


def slope(fn, *args, reps=10):
    fn(*args)[0].block_until_ready()
    def run(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(o[0].sum())  # forced D2H: block_until_ready lies here
        return time.time() - t0
    t2, t8 = run(2), run(2 + reps)
    return (t8 - t2) / reps


def main():
    rng = np.random.RandomState(0)
    B = 16
    for (H, S, Rc) in [(128, 128, 128), (256, 32, 128), (512, 8, 128)]:
        x = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        y = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        w = jnp.asarray(rng.randn(2 * H, H).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.randn(2 * H).astype(np.float32) * 0.1)
        w1 = jnp.asarray(rng.randn(2 * H, H).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.randn(2 * H).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.randn(H, 2 * H).astype(np.float32) * 0.05)
        b2 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
        m = jnp.zeros((1,), jnp.float32)
        s = jnp.ones((1,), jnp.float32)

        glu_p = jax.jit(lambda *a: (chmix.mix_glu_res(*a, fast=True),))
        glu_r = jax.jit(lambda *a: (chmix.glu_res_ref(*a),))
        o_p = np.asarray(glu_p(y, x, w, b)[0], np.float32)
        o_r = np.asarray(glu_r(y, x, w, b)[0], np.float32)
        err = np.abs(o_p - o_r).max() / max(np.abs(o_r).max(), 1e-6)
        tp, tr = slope(glu_p, y, x, w, b), slope(glu_r, y, x, w, b)
        print(f"glu H={H:3d} S={S:3d}: rel_err {err:.2e} "
              f"pallas {tp*1e3:6.2f} ms  xla {tr*1e3:6.2f} ms", flush=True)

        ff_p = jax.jit(lambda *a: (chmix.ln_ff_res(*a, fast=True),))
        ff_r = jax.jit(lambda *a: (chmix.ln_ff_res_ref(*a),))
        o_p = np.asarray(ff_p(x, m, s, w1, b1, w2, b2)[0], np.float32)
        o_r = np.asarray(ff_r(x, m, s, w1, b1, w2, b2)[0], np.float32)
        err = np.abs(o_p - o_r).max() / max(np.abs(o_r).max(), 1e-6)
        tp = slope(ff_p, x, m, s, w1, b1, w2, b2)
        tr = slope(ff_r, x, m, s, w1, b1, w2, b2)
        print(f"ff  H={H:3d} S={S:3d}: rel_err {err:.2e} "
              f"pallas {tp*1e3:6.2f} ms  xla {tr*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
