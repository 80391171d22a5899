#!/usr/bin/env python
"""TPU timing at the LJSpeech-harder vocoder operating point
(reference configs/experiment/ljspeech_harder.yaml: segment 44000,
hop 2048, sashimi d32, T=50, conditional).  Slope-timed with forced D2H.
"""

import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffwave_sashimi_tpu.diffusion import (diffusion_schedule,  # noqa: E402
                                            make_sampling_step)
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402

B, D, L, T, SR, HOP = 8, 32, 44000, 50, 22050, 2048


def bench_vocoder() -> float:
    """Returns the measured x-realtime factor (22.05 kHz, B8, T=50)."""
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, unconditional=False, mel_upsample=(32, 64),
                    dtype=jnp.bfloat16)
    n_frames = L // HOP + 1
    mel = jnp.asarray(np.random.RandomState(0).randn(
        B, 80, n_frames).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, L), jnp.float32),
        jnp.zeros((1,), jnp.int32), mel[:1])
    from diffwave_sashimi_tpu.runtime.generate import (precompute_kernels,
                                                       precompute_mel_conds)
    kernels = precompute_kernels(model, params, L)
    mel_conds = precompute_mel_conds(model, params, mel, L, kernels)
    print("kernels + hoisted mel conditioning via runtime selection",
          flush=True)
    sched = diffusion_schedule(T=T, beta_0=1e-4, beta_T=0.05)
    step = make_sampling_step(
        lambda pk, x, t, m: model.apply(pk[0], x, t, m, pk[1],
                                        mel_conds=pk[2]),
        (B, 1, L), sched)
    x = jnp.zeros((B, 1, L), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), sched.T)
    sarr = jnp.stack([sched.alpha, sched.alpha_bar,
                      sched.sigma]).astype(jnp.float32)
    t0 = time.time()
    out = step((params, kernels, mel_conds), x, None, keys, sarr,
               np.int32(25))
    float(out.sum())
    print(f"first (incl compile) {time.time()-t0:.0f}s", flush=True)

    def timed(k):
        xx = x
        t0 = time.time()
        for i in range(k):
            xx = step((params, kernels, mel_conds), xx, None, keys, sarr,
                      np.int32(25))
        float(xx.sum())
        return time.time() - t0

    t1, t9 = timed(2), timed(10)
    ms = (t9 - t1) / 8 * 1000
    rt = B * (L / SR) / (T * ms / 1000)
    print(f"step: {ms:.1f} ms -> {rt:.2f}x realtime at T={T} "
          f"(22.05 kHz vocoding, B{B})", flush=True)
    return rt


if __name__ == "__main__":
    bench_vocoder()
