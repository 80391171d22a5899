#!/usr/bin/env python
"""Attribute the train-step's S4 kernel-construction cost (the `kern`
component of scripts/train_ablation.py — 144 ms of the 237 ms B8 step,
2026-08-18) between its stages, and measure the bf16-FFT lever.

Times jitted fwd and fwd+vjp of Sashimi.compute_kernels(L, "v2") — the
exact per-train-step construction: cauchy (Pallas) -> Woodbury ->
irfft_mxu@L -> rfft_mxu@n -> layout packing — under:

  strict   default: both MXU FFT stages at HIGHEST precision (f32, 6-pass)
  high     Precision.HIGH: f32 operands, 3-pass bf16x3 (~2x MXU
           throughput of strict, rel err ~1e-6)
  fast     bf16 operands, DEFAULT precision (~6x MXU throughput, rel err
           ~2e-3 — the same mode the sampling conv chain uses end-to-end)

Each non-strict mode also reports the on-chip kernel error vs strict
(reduced on device — a full-kernel D2H through the tunnel is minutes).

Slope-timed with forced D2H (CLAUDE.md facts 5, 13).
"""

import time

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffwave_sashimi_tpu.models.sashimi import Sashimi  # noqa: E402
from diffwave_sashimi_tpu.ops import mxu_fft  # noqa: E402

D, L = 128, 16000


def slope(fn, *args):
    def timed(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        jax.tree.leaves(o)[0].block_until_ready()
        float(jax.tree.leaves(o)[0].ravel()[0])
        return time.time() - t0
    timed(1)  # warmup: absorb any post-compile one-off (first-dispatch
    #           setup / tunnel hiccup) outside the measured pair
    for _ in range(3):
        t2, t6 = timed(2), timed(6)
        ms = (t6 - t2) / 4 * 1000
        if ms > 0:
            return ms
    return ms  # give up; caller sees the (negative) artifact


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))

    strict_out = None
    for mode in ("strict", "high", "fast"):
        # fresh function objects per mode: jax.jit's dispatch cache keys on
        # the underlying function identity + avals, so re-jitting the SAME
        # function after toggling the mode silently reuses the first
        # mode's trace (observed 2026-08-18: the "fast" variant cache-hit
        # the strict program — 0 s compile, identical timings)
        def ck(p):
            return model.apply(p, L, "v2", method=Sashimi.compute_kernels)

        def fwd_bwd(p):
            out, pull = jax.vjp(ck, p)
            cot = jax.tree.map(jnp.ones_like, out)
            (g,) = pull(cot)
            # reduce to a tiny output so the D2H read is cheap but forces
            # the whole backward
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(g))

        mxu_fft.set_fast_mode(False if mode == "strict" else mode)
        try:
            f_fwd = jax.jit(ck)
            f_fb = jax.jit(fwd_bwd)
            t0 = time.time()
            out = f_fwd(params)
            jax.tree.leaves(out)[0].block_until_ready()
            print(f"[{mode}] fwd compile {time.time() - t0:.0f}s", flush=True)
            # on-chip accuracy vs strict: reduce ON DEVICE (a full-kernel
            # D2H is hundreds of MB through the tunnel — minutes)
            if mode == "strict":
                strict_out = out
            else:
                @jax.jit
                def _err(a, b):
                    # worst PER-LEAF relative error (a global max-diff /
                    # global max-magnitude ratio understates error on
                    # small-magnitude leaves); zero-scale leaves report 0
                    # if exactly matched, else inf
                    m = r = jnp.float32(0)
                    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                        mi = jnp.max(jnp.abs(
                            x.astype(jnp.float32) - y.astype(jnp.float32)))
                        si = jnp.max(jnp.abs(y.astype(jnp.float32)))
                        ri = jnp.where(si > 0, mi / jnp.maximum(si, 1e-30),
                                       jnp.where(mi > 0, jnp.inf,
                                                 jnp.float32(0)))
                        m = jnp.maximum(m, mi)
                        r = jnp.maximum(r, ri)
                    return m, r
                m, r = _err(out, strict_out)
                print(f"[{mode}] kernel err vs strict: max {float(m):.2e} "
                      f"worst-leaf rel {float(r):.2e}", flush=True)
            ms_f = slope(f_fwd, params)
            t0 = time.time()
            float(f_fb(params))
            print(f"[{mode}] fwd+bwd compile {time.time() - t0:.0f}s",
                  flush=True)
            ms_fb = slope(f_fb, params)
            print(f"[{mode}] construction fwd {ms_f:7.1f} ms   "
                  f"fwd+bwd {ms_fb:7.1f} ms", flush=True)
        finally:
            mxu_fft.set_fast_mode(False)


if __name__ == "__main__":
    main()
