#!/usr/bin/env python
"""int8 fused-conv lever: end-to-end quality gate + sampling-step timing.

Part 1 (quality): the full reverse process (d64/n2, T=50, B4, perturbed
params — CLAUDE.md fact 12) under strict / fast-bf16 / int8 conv modes;
prints waveform correlation + max abs diff vs strict, the committed gate
for the mode (same protocol as scripts/fast_vs_strict.py, BASELINE.md).

Part 2 (perf): the bench operating point (d128/L16000, T=200, B16)
timed with the int8 stage path off and on.

Run on TPU: python scripts/int8_check.py [--skip-perf]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffwave_sashimi_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from diffwave_sashimi_tpu.diffusion import (diffusion_schedule,  # noqa: E402
                                            make_sampling_step)
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402
from diffwave_sashimi_tpu.ops import fftconv2, fftconv_pallas  # noqa: E402


def quality():
    B, D, L, T = 4, 64, 16000, 50
    model = Sashimi(d_model=D, n_layers=2, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L)),
                                 jnp.zeros((1,), jnp.int32))
    rng = np.random.RandomState(3)
    leaves, tree = jax.tree.flatten(params)
    leaves = [l + jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 0.02)
              for l in leaves]
    params = jax.tree.unflatten(tree, leaves)
    sched = diffusion_schedule(T=T, beta_0=1e-4, beta_T=0.02)
    keys = jax.random.split(jax.random.PRNGKey(1), sched.T)
    sarr = jnp.stack([sched.alpha, sched.alpha_bar,
                      sched.sigma]).astype(jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (B, 1, L))
    outs = {}
    for mode in ("strict", "fast", "int8"):
        fftconv_pallas.set_fast(mode != "strict")
        fftconv2.set_int8(mode == "int8")
        try:
            kernels = jax.jit(lambda p: model.apply(
                p, L, "v2", method=Sashimi.compute_kernels))(params)
            step = make_sampling_step(
                lambda pk, x, t, mel: model.apply(pk[0], x, t, mel, pk[1]),
                (B, 1, L), sched)
            x = x0
            for t in range(T - 1, -1, -1):
                x = step((params, kernels), x, None, keys, sarr,
                         np.int32(t))
            outs[mode] = np.asarray(x, np.float32)
            print(f"[{mode}] waveform std {outs[mode].std():.4f}",
                  flush=True)
        finally:
            fftconv_pallas.set_fast(True)
            fftconv2.set_int8(False)
    ref = outs["strict"]
    for mode in ("fast", "int8"):
        a = outs[mode]
        corr = np.corrcoef(a.ravel(), ref.ravel())[0, 1]
        print(f"[{mode}] vs strict: corr {corr:.5f}  max abs diff "
              f"{np.abs(a - ref).max():.4f} (signal std {ref.std():.4f})",
              flush=True)


def perf():
    import bench
    for int8 in (False, True):
        fftconv2.set_int8(int8)
        try:
            b, rt, dt = bench._measure_generation_one(16, 200, 16000, 16000)
            print(f"[perf] int8={int8}: {rt:.3f}x realtime "
                  f"({dt * 1000 / 200:.1f} ms/step at B16)", flush=True)
        finally:
            fftconv2.set_int8(False)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-perf", action="store_true")
    ap.add_argument("--skip-quality", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    if not args.skip_quality:
        quality()
    if not args.skip_perf:
        perf()
