#!/usr/bin/env python
"""In-situ ablation timing of the TRAINING step (sashimi d128, B8, remat).

Same method as scripts/step_ablation.py: time the FULL jitted train step
with individual components replaced by cheap stand-ins; the difference of
whole-program times attributes the budget (isolated per-kernel timing
through the tunnel is dispatch-noise-dominated).  Slope-timed with forced
D2H (CLAUDE.md facts 5, 13).

Components:
  kern   S4 kernel construction (NPLR/cauchy/Woodbury + MXU-FFT spectrum),
         forward AND backward (stub returns jnp.zeros of the right shapes)
  conv   fused conv fwd + input-grad + dkf spectrum-grad (stub keeps the
         spectra consumed so the construction backward still runs)
  chmix  fused LN+FF and GLU train kernels (fwd + hand-written bwd)
"""

import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from diffwave_sashimi_tpu.diffusion import diffusion_schedule  # noqa: E402
from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402
from diffwave_sashimi_tpu.models import sashimi as sashimi_mod  # noqa: E402
from diffwave_sashimi_tpu.ops import chmix, fftconv2 as f2  # noqa: E402
from diffwave_sashimi_tpu.runtime.train import make_train_step  # noqa: E402

B, D, L = 8, 128, 16000


def build_step(ablate=()):
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16, remat=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(params)

    orig_ck = Sashimi.compute_kernels
    orig_chmix = {k: getattr(chmix, k)
                  for k in ("mix_glu_res_train", "ln_ff_res_train")}
    orig_f2 = f2.fftconv2

    if "kern" in ablate:
        shapes = jax.eval_shape(
            lambda p: orig_ck(model.bind(p), L, "v2"), params)

        def _ck_stub(self, audio_length, freq=False):
            return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        Sashimi.compute_kernels = _ck_stub
    if "conv" in ablate:
        # keep kfr/kfi consumed: the construction backward still runs with
        # (zero) cotangents, so only the conv fwd/du/dkf time is removed
        f2.fftconv2 = lambda u, kfr, kfi, lay, fast=True: \
            u + (0.0 * (kfr.mean() + kfi.mean())).astype(u.dtype)
    if "chmix" in ablate:
        def _ff_stub(x, m, s, w1, b1, w2, b2, fast=True, skip=None):
            return x if skip is None else x + skip
        chmix.ln_ff_res_train = _ff_stub
        chmix.mix_glu_res_train = lambda y, res, w, b, fast=True: y + res

    try:
        step = make_train_step(model, optimizer, schedule)
        audio = jax.random.normal(jax.random.PRNGKey(9), (B, 1, L)) * 0.1
        t0 = time.time()
        p, o, loss = step(params, opt_state, audio, None,
                          jax.random.PRNGKey(1))
        float(loss)
        print(f"  compile+first ({','.join(ablate) or 'full'}): "
              f"{time.time() - t0:.1f}s", flush=True)

        def timed(k, seed0):
            # the step donates (params, opt_state): always thread the
            # freshest arrays forward, never reuse a donated buffer
            nonlocal p, o
            ll = None
            t0 = time.time()
            for i in range(k):
                p, o, ll = step(p, o, audio, None,
                                jax.random.PRNGKey(seed0 + i))
            float(ll)
            return time.time() - t0

        # chains of >6 queued train steps without an intermediate D2H
        # have errored the backend (CLAUDE.md fact 6) — keep it at 2/6
        # like bench.py
        t1, t7 = timed(2, 30), timed(6, 40)
        return (t7 - t1) / 4 * 1000
    finally:
        Sashimi.compute_kernels = orig_ck
        for k, v in orig_chmix.items():
            setattr(chmix, k, v)
        f2.fftconv2 = orig_f2


def main():
    import sys
    print(f"device: {jax.devices()[0]}", flush=True)
    full = build_step()
    print(f"full train step:     {full:8.1f} ms", flush=True)
    if "--full-only" in sys.argv:
        return
    res = {}
    for abl in (("conv",), ("chmix",), ("kern",), ("conv", "chmix", "kern")):
        res[abl] = build_step(abl)
        print(f"-{'+'.join(abl):16s}  {res[abl]:8.1f} ms", flush=True)
    print(f"full train step:     {full:8.1f} ms")
    for abl, ms in res.items():
        print(f"-{'+'.join(abl):16s}  {ms:8.1f} ms  "
              f"(=> {full - ms:5.1f} ms attributed)")


if __name__ == "__main__":
    main()
