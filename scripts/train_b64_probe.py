#!/usr/bin/env python
"""One-off: does a B64 train step fit HBM and beat B32's samples/s?

Round-3/4 train scaling (slope-timed, d128/L16000, remat): B8 33.8 ->
B16 43.6 -> B32 50.9 samples/s, because per-step S4 kernel construction
is batch-independent (scripts/train_ablation.py: ~61% of the B8 step).
B64 is the next doubling; HBM is 15.75 GB so it may OOM in compile —
that is a result too.  Usage: python scripts/train_b64_probe.py [B].
"""

import sys
import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from diffwave_sashimi_tpu.diffusion import diffusion_schedule  # noqa: E402
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402
from diffwave_sashimi_tpu.runtime.train import make_train_step  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
D, L = 128, 16000


def main():
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16, remat=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, schedule)

    x = jax.random.normal(jax.random.PRNGKey(9), (B, 1, L)) * 0.1
    t0 = time.time()
    params2, opt_state2, loss = step(params, opt_state, x, None,
                                     jax.random.PRNGKey(1))
    print(f"compile+first: {time.time() - t0:.1f}s loss={float(loss):.4f}",
          flush=True)

    # slope timing with forced D2H (CLAUDE.md fact 5)
    def timed(k, seed0):
        p, o = params2, opt_state2
        t0 = time.time()
        for i in range(k):
            p, o, l = step(p, o, x, None, jax.random.PRNGKey(seed0 + i))
        _ = float(jax.tree.leaves(p)[0].sum())
        return time.time() - t0

    t2, t6 = timed(2, 100), timed(6, 200)
    ms = (t6 - t2) / 4 * 1000
    print(f"B{B} train step: {ms:.1f} ms  "
          f"({1000.0 / ms:.3f} steps/s, {B * 1000.0 / ms:.1f} samples/s)",
          flush=True)


if __name__ == "__main__":
    main()
