#!/usr/bin/env python
"""Decompose the NON-conv part of the sampling step (B16/d128, v2 path).

Each variant stubs one component class-wide (module monkeypatch) and
re-times the full step; the delta vs 'full' attributes time to that
component.  Slope-timed with forced D2H.
"""

import sys
import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import diffwave_sashimi_tpu.models.sashimi as sash  # noqa: E402
from diffwave_sashimi_tpu.diffusion import (diffusion_schedule,  # noqa: E402
                                            make_sampling_step)
from diffwave_sashimi_tpu.models import s4 as s4mod  # noqa: E402
from diffwave_sashimi_tpu.ops import fftconv2 as f2  # noqa: E402

B, D, L = 16, 128, 16000


def time_step(tag):
    model = sash.Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                         L=L, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    kernels = jax.jit(lambda p: model.apply(
        p, L, "v2", method=sash.Sashimi.compute_kernels))(params)
    sched = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
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
    compile_s = time.time() - t0

    def timed(k):
        xx = x
        t0 = time.time()
        for _ in range(k):
            xx = step((params, kernels), xx, None, keys, sarr, np.int32(100))
        float(xx.sum())
        return time.time() - t0

    t1, t5 = timed(1), timed(5)
    ms = (t5 - t1) / 4 * 1000
    print(f"{tag:24s}: {ms:7.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return ms


class _IdentityLN(sash.TransposedLN):
    def __call__(self, x):
        return x


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    which = sys.argv[1:] or ["full", "no_ln", "no_ff", "no_glu", "no_gelud"]
    base = None
    for tag in which:
        saved = {}
        try:
            if tag == "no_ln":
                saved["ln"] = sash.TransposedLN.__call__
                sash.TransposedLN.__call__ = lambda self, x: x
            elif tag == "no_ff":
                saved["ff"] = sash.DiffWaveBlock.__call__
                orig = saved["ff"]

                def no_ff(self, x, step_embed, mel_spec=None, kernel=None,
                          train=False):
                    y = self.norm1(x)
                    bias = self.fc_t(step_embed)
                    y = y + (bias[:, None, :, None] if x.ndim == 4
                             else bias[:, :, None])
                    y = self.s4(y, kernel=kernel, train=train)
                    return x + y
                sash.DiffWaveBlock.__call__ = no_ff
            elif tag == "no_glu":
                # skip output_linear + GLU (shape-preserving for glu)
                saved["glu"] = s4mod.S4._postact
                s4mod.S4._postact = lambda self, y: y
            elif tag == "no_gelud":
                saved["g"] = f2.fftconv2_gelu_d
                f2.fftconv2_gelu_d = \
                    lambda u, a, b, d, lay, fast=True: f2.fftconv2(
                        u, a, b, lay, fast)
            ms = time_step(tag)
            if tag == "full":
                base = ms
            elif base is not None:
                print(f"  -> {tag} saves {base - ms:.1f} ms", flush=True)
        finally:
            if "ln" in saved:
                sash.TransposedLN.__call__ = saved["ln"]
            if "ff" in saved:
                sash.DiffWaveBlock.__call__ = saved["ff"]
            if "glu" in saved:
                s4mod.S4._postact = saved["glu"]
            if "g" in saved:
                f2.fftconv2_gelu_d = saved["g"]


if __name__ == "__main__":
    main()
