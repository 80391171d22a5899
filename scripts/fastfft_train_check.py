#!/usr/bin/env python
"""Validate + measure the kernel_fft_fast training lever on TPU.

Builds the d128/L16000 remat train step twice from the SAME init — strict
(default) and kernel_fft_fast=True (bf16 MXU FFTs inside per-step S4
kernel construction) — then:

  1. runs K steps of each (strict / "high" bf16x3 / fast bf16) on the
     same synthetic batch stream and prints
     the loss trajectories (the fast path must track strict and decrease;
     diffusion training is noise-dominated, so a few-percent divergence
     is expected and fine);
  2. slope-times both steps at the bench operating batch.

Usage: python scripts/fastfft_train_check.py [--batch 16] [--steps 40]
"""

import argparse
import time

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from diffwave_sashimi_tpu.diffusion import diffusion_schedule  # noqa: E402
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402
from diffwave_sashimi_tpu.runtime.train import make_train_step  # noqa: E402

D, L = 128, 16000


def build(mode, batch: int):
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16, remat=True,
                    kernel_fft_fast=mode)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, schedule)
    return step, params, opt_state


def run(mode, batch: int, steps: int):
    tag = {False: "strict", "high": "high", True: "fast"}[mode]
    step, p, o = build(mode, batch)
    audio = jax.random.normal(jax.random.PRNGKey(9), (batch, 1, L)) * 0.1
    t0 = time.time()
    losses = []
    ll = None
    for i in range(steps):
        p, o, ll = step(p, o, audio, None, jax.random.PRNGKey(100 + i))
        # D2H every few steps: long un-synced dispatch chains have
        # deadlocked the queue on this backend (CLAUDE.md fact 6)
        if i % 5 == 4 or i == 0:
            losses.append((i, float(ll)))
    print(f"[{tag}] {steps} steps in {time.time() - t0:.0f}s "
          f"(incl. compile), losses:", flush=True)
    for i, v in losses:
        print(f"  step {i:3d}: {v:.5f}", flush=True)

    def timed(k, seed0):
        nonlocal p, o
        lv = None
        t0 = time.time()
        for i in range(k):
            p, o, lv = step(p, o, audio, None, jax.random.PRNGKey(seed0 + i))
        float(lv)
        return time.time() - t0
    timed(1, 300)
    t2, t6 = timed(2, 310), timed(6, 320)
    ms = (t6 - t2) / 4 * 1000
    print(f"[{tag}] step {ms:.1f} ms = {1000 / ms:.2f} steps/s "
          f"= {batch * 1000 / ms:.1f} samples/s", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}  B={args.batch}", flush=True)
    ms_s = run(False, args.batch, args.steps)
    ms_h = run("high", args.batch, args.steps)
    ms_f = run(True, args.batch, args.steps)
    print(f"speedup high: {ms_s / ms_h:.2f}x ({ms_s:.1f} -> {ms_h:.1f}), "
          f"fast: {ms_s / ms_f:.2f}x ({ms_s:.1f} -> {ms_f:.1f} ms/step)")


if __name__ == "__main__":
    main()
