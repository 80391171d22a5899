#!/usr/bin/env python
"""Full B32 train step (sashimi d128/L16000, remat, bf16): stage-merge
OFF vs ON within one session (tunnel variance is ±25% across sessions;
only within-run comparisons count — CLAUDE.md round-3).

Round-5 lever #3: the batch-independent S4 kernel-construction share is
the train step's binding constraint (BASELINE.md round-4: ~100 ms fixed
cost, diagnosed as many small latency/HBM-bound ops); merging same-tier
stages (d0+u1, d1+u0) into one wide vmap halves the construction
program count.  Target: B32 > 60 samples/s (round-4: 50.9).

Usage: python scripts/train_merge_check.py [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffwave_sashimi_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from diffwave_sashimi_tpu.diffusion import diffusion_schedule  # noqa: E402
from diffwave_sashimi_tpu.models import sashimi as sashimi_mod  # noqa: E402
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402
from diffwave_sashimi_tpu.runtime.train import make_train_step  # noqa: E402

D, L = 128, 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B = args.batch
    print(f"device: {jax.devices()[0]}  batch={B}", flush=True)

    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16, remat=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    optimizer = optax.adam(2e-4)
    audio = jnp.asarray(np.random.RandomState(0)
                        .randn(B, 1, L).astype(np.float32) * 0.1)
    rng = jax.random.PRNGKey(1)

    for merge in (False, True):
        sashimi_mod.MERGE_STAGES["enabled"] = merge
        step = make_train_step(model, optimizer, schedule)
        p = jax.tree.map(jnp.array, params)
        o = optimizer.init(p)
        t0 = time.time()
        p, o, loss = step(p, o, audio, None, rng)
        print(f"[merge={int(merge)}] compile+1st {time.time() - t0:.0f}s "
              f"loss {float(loss):.4f}", flush=True)

        # slope timing with forced D2H (facts 5/13): thread the donated
        # state through a chain of steps, read the final loss
        def timed(k):
            nonlocal p, o
            ls = None
            t0 = time.time()
            for _ in range(k):
                p, o, ls = step(p, o, audio, None, rng)
            float(ls)
            return time.time() - t0

        timed(1)
        ms = -1.0
        for _ in range(3):
            t2, t6 = timed(2), timed(6)
            ms = (t6 - t2) / 4 * 1000
            if ms > 0:
                break
        sps = 1000.0 / ms
        print(f"[merge={int(merge)}] step {ms:.1f} ms  {sps:.3f} steps/s  "
              f"{sps * B:.1f} samples/s", flush=True)
    sashimi_mod.MERGE_STAGES["enabled"] = True


if __name__ == "__main__":
    main()
