#!/usr/bin/env python
"""Ablation timing of the sampling step: full vs S4-convs-skipped.

Quantifies how much of the per-step time the fused FFT convolutions account
for (vs pointwise matmuls / LN / embedding / sampler arithmetic), to target
round-2 optimization. Slope-timed with forced D2H (CLAUDE.md facts 5, 13).
"""

import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffwave_sashimi_tpu.diffusion import (diffusion_schedule,  # noqa: E402
                                            make_sampling_step)
from diffwave_sashimi_tpu.models import s4 as s4mod  # noqa: E402
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402

B, D, L = 16, 128, 16000


def build_step(ablate_conv: bool, mode: str = "v2"):
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    kernels = jax.jit(lambda p: model.apply(
        p, L, mode, method=Sashimi.compute_kernels))(params)
    sched = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)

    from diffwave_sashimi_tpu.ops import fftconv2 as f2
    orig = s4mod.fftconv_fused
    orig2, orig2g = f2.fftconv2, f2.fftconv2_gelu_d
    if ablate_conv:
        # identity-ish stand-ins with the same signature/shape
        s4mod.fftconv_fused = lambda u, kf, n, Lo, fast=False: u[..., :Lo]
        s4mod.fftconv2.fftconv2 = lambda u, a, b, lay, fast=True: u
        s4mod.fftconv2.fftconv2_gelu_d = \
            lambda u, a, b, d, lay, fast=True: u
    try:
        step = make_sampling_step(
            lambda pk, x, t, mel: model.apply(pk[0], x, t, mel, pk[1]),
            (B, 1, L), sched)
        # trace/compile happens lazily at first call; keep patch active
        x = jnp.zeros((B, 1, L), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), sched.T)
        sarr = jnp.stack([sched.alpha, sched.alpha_bar,
                          sched.sigma]).astype(jnp.float32)
        t0 = time.time()
        out = step((params, kernels), x, None, keys, sarr, np.int32(100))
        float(out.sum())
        print(f"  compile+first ({'ablated' if ablate_conv else 'full'}): "
              f"{time.time() - t0:.1f}s", flush=True)

        def timed(k):
            xx = x
            t0 = time.time()
            for i in range(k):
                xx = step((params, kernels), xx, None, keys, sarr,
                          np.int32(100))
            float(xx.sum())
            return time.time() - t0

        t1, t5 = timed(1), timed(5)
        ms = (t5 - t1) / 4 * 1000
        return ms
    finally:
        s4mod.fftconv_fused = orig
        f2.fftconv2, f2.fftconv2_gelu_d = orig2, orig2g
        s4mod.fftconv2.fftconv2 = orig2
        s4mod.fftconv2.fftconv2_gelu_d = orig2g


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    full = build_step(False)
    abl = build_step(True)
    print(f"full step:        {full:8.1f} ms")
    print(f"convs ablated:    {abl:8.1f} ms")
    print(f"=> S4 fused convs: {full - abl:.1f} ms "
          f"({100 * (full - abl) / full:.0f}% of step)")


if __name__ == "__main__":
    main()
