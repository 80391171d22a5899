#!/usr/bin/env python
"""TPU timing of the DiffWave WaveNet backbone at the reference operating
point wnet_h256_d36 (configs/model/wavenet.yaml: res=skip=256, 36 layers,
dilation cycle 12; reference models/wavenet.py:45-121), SC09 L=16000.

Measures the T=200 sampling step and the training step (B as given).
Slope-timed with forced D2H (CLAUDE.md facts 5/13).

FLOP accounting per sample forward (L=16000):
  dilated k=3 conv: 36 * 2*3*L*C*2C   = 453 GFLOP
  res+skip 1x1:     36 * 2*L*C*(C+S)  = 151 GFLOP
  => ~0.61 TFLOP/sample fwd; bf16 peak 197 TF/s gives a ~50 ms/step
  MXU floor at B16 (1.6x realtime ceiling at T=200 — WaveNet is ~2.4x
  the FLOPs of sashimi d128).
"""

import argparse
import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from diffwave_sashimi_tpu.diffusion import (diffusion_schedule,  # noqa: E402
                                            make_sampling_step,
                                            training_loss)
from diffwave_sashimi_tpu.models.wavenet import WaveNet  # noqa: E402

L, SR = 16000, 16000


def build(B, dtype=jnp.bfloat16, remat=False):
    model = WaveNet(res_channels=256, skip_channels=256, num_res_layers=36,
                    dilation_cycle=12, dtype=dtype, remat=remat)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    return model, params


def slope(run, x0, reps=8):
    x = run(x0)
    float(np.asarray(jax.tree.leaves(x)[0]).sum())  # compile+first

    def timed(k):
        o = x0
        for _ in range(k):
            o = run(o)
        float(np.asarray(jax.tree.leaves(o)[0]).sum())
    t0 = time.time(); timed(1); t1 = time.time() - t0
    t0 = time.time(); timed(1 + reps); tn = time.time() - t0
    return (tn - t1) / reps


def bench_sampling(B):
    model, params = build(B)
    sched = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    step = make_sampling_step(
        lambda p, x, t, mel: model.apply(p, x, t, mel),
        (B, 1, L), sched)
    keys = jax.random.split(jax.random.PRNGKey(1), sched.T)
    sarr = jnp.stack([sched.alpha, sched.alpha_bar,
                      sched.sigma]).astype(jnp.float32)
    x = jnp.zeros((B, 1, L), jnp.float32)
    ms = slope(lambda xx: step(params, xx, None, keys, sarr,
                               np.int32(100)), x) * 1000
    rt = B * (L / SR) / (200 * ms / 1000)
    print(f"sampling step B{B}: {ms:.1f} ms -> {rt:.2f}x realtime at "
          f"T=200", flush=True)
    return rt


def bench_train(B, remat=True):
    model, params = build(B, remat=remat)
    sched = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    opt = optax.adam(2e-4)
    ost = opt.init(params)

    def apply_fn(p, x, t, mel=None, **kw):
        return model.apply(p, x, t, mel, train=True, **kw)

    @jax.jit
    def step(p, o, audio, rng):
        l, g = jax.value_and_grad(
            lambda pp: training_loss(apply_fn, pp, audio, sched, rng))(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2, l

    audio = jnp.asarray(np.random.RandomState(0).randn(B, 1, L)
                        .astype(np.float32) * 0.3)
    rng = jax.random.PRNGKey(2)

    state = {"p": params, "o": ost}

    def run(s):
        p, o, _ = step(s["p"], s["o"], audio, rng)
        return {"p": p, "o": o}

    sec = slope(run, state, reps=4)
    print(f"train step B{B} remat={remat}: {sec * 1000:.1f} ms "
          f"-> {1 / sec:.2f} steps/s ({B / sec:.1f} samples/s)", flush=True)
    return 1 / sec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=4)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="enable the fused gate+res/skip Pallas tail "
                         "(measured slower than XLA on v5e; default off)")
    args = ap.parse_args()
    if args.fused:
        from diffwave_sashimi_tpu.ops import wavenet_gate

        wavenet_gate.FUSED_TAIL["enabled"] = True
    print(f"device: {jax.devices()[0]}", flush=True)
    bench_sampling(args.batch)
    if not args.skip_train:
        bench_train(args.train_batch)
