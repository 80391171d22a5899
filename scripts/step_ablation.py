#!/usr/bin/env python
"""In-situ ablation timing of the sampling step (sashimi d128, B16).

Times the FULL jitted step with individual fused kernels replaced by
cheap stand-ins; the difference of whole-program times attributes the
step budget reliably (isolated per-kernel timing through the tunnel is
dispatch-noise-dominated — scripts/step_account.py measured a 140 ms sum
for a 77 ms step).  Slope-timed with forced D2H (CLAUDE.md facts 5, 13).
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
from diffwave_sashimi_tpu.ops import chmix, fftconv2 as f2  # noqa: E402

B, D, L = 16, 128, 16000


def build_step(ablate=()):
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    kernels = jax.jit(lambda p: model.apply(
        p, L, "v2", method=Sashimi.compute_kernels))(params)
    sched = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)

    orig = {k: getattr(chmix, k) for k in ("mix_glu_res", "ln_ff_res")}
    orig_f2 = {k: getattr(f2, k) for k in
               ("fftconv2_ln_bias_gelu_d", "fftconv2_gelu_d", "fftconv2")}
    if "glu" in ablate:
        chmix.mix_glu_res = lambda y, r, w, b, fast=True: y + r
    if "ff" in ablate:
        def _ff_stub(x, m, s, w1, b1, w2, b2, fast=True, skip=None,
                     emit_stats=False):
            out = x if skip is None else x + skip
            if emit_stats:
                z = jnp.zeros(
                    (out.shape[0], out.shape[1], out.shape[3]), jnp.float32)
                return out, z, z
            return out
        chmix.ln_ff_res = _ff_stub
    if "conv" in ablate:
        # keep the prologue's inputs consumed so XLA can't DCE the stats
        f2.fftconv2_ln_bias_gelu_d = \
            lambda u, a, c, bias, kfr, kfi, d, lay, fast=True: \
            (u.astype(jnp.float32) * a[:, :, None, :]
             + c[:, :, None, :]).astype(u.dtype)
        f2.fftconv2_gelu_d = lambda u, a, b, d, lay, fast=True: u
        f2.fftconv2 = lambda u, a, b, lay, fast=True: u
    try:
        step = make_sampling_step(
            lambda pk, x, t, mel: model.apply(pk[0], x, t, mel, pk[1]),
            (B, 1, L), sched)
        x = jnp.zeros((B, 1, L), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), sched.T)
        sarr = jnp.stack([sched.alpha, sched.alpha_bar,
                          sched.sigma]).astype(jnp.float32)
        t0 = time.time()
        out = step((params, kernels), x, None, keys, sarr, np.int32(100))
        float(out.sum())
        print(f"  compile+first ({','.join(ablate) or 'full'}): "
              f"{time.time() - t0:.1f}s", flush=True)

        def timed(k):
            xx = x
            t0 = time.time()
            for i in range(k):
                xx = step((params, kernels), xx, None, keys, sarr,
                          np.int32(100))
            float(xx.sum())
            return time.time() - t0

        t1, t9 = timed(2), timed(10)
        return (t9 - t1) / 8 * 1000
    finally:
        for k, v in orig.items():
            setattr(chmix, k, v)
        for k, v in orig_f2.items():
            setattr(f2, k, v)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    full = build_step()
    res = {}
    for abl in (("conv",), ("glu",), ("ff",), ("conv", "glu", "ff")):
        res[abl] = build_step(abl)
    print(f"full step:          {full:8.1f} ms")
    for abl, ms in res.items():
        print(f"-{'+'.join(abl):14s}    {ms:8.1f} ms  "
              f"(=> {full - ms:5.1f} ms attributed)")


if __name__ == "__main__":
    main()
