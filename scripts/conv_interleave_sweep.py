#!/usr/bin/env python
"""Sweep conv-kernel interleave configs BEYOND the frame-budget heuristic.

Round-3 settled on HB8/BB2 for S>=16 tiers (two independent batch chains
per program).  Per-program arithmetic says the chains still run mostly
serially: tier-1 measures ~12.5 us/program vs ~6.2 us MXU + ~5 us VPU —
ideal overlap would approach max() not sum().  The configs that could
deepen the interleave (HB8/BB4, HB1/BB8, HB1/BB16) are excluded by
``choose_layout``'s VMEM frame ESTIMATE, not by a measured Mosaic
failure — this sweep forces them (explicit HB=/BB= bypasses the budget)
and lets the real scoped-vmem allocator accept or reject.

Slope-timed with forced D2H (CLAUDE.md facts 5/13); compare only within
one run (tunnel load drifts +-25% between sessions).
"""

import argparse
import json
import time

import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffwave_sashimi_tpu.ops import fftconv2 as f2  # noqa: E402

# (label, H, L, n) — the SC09 d128 tiers (same as ops/tune.py CONV_TIERS)
TIERS = {
    "t1": (128, 16000, 32768),
    "t2": (256, 4000, 8192),
    "t3": (512, 1000, 2048),
}

# (HB, BB) candidates per tier: the current default first, then the
# budget-excluded deeper interleaves.  HB in (2, 4) stays excluded
# (sub-tile middle dims — Mosaic pads 4-8x / crashes layout inference).
CANDS = {
    "t1": [(8, 2), (8, 4), (16, 2), (1, 8), (1, 16)],
    "t2": [(8, 2), (8, 4), (16, 2), (16, 4), (1, 8), (1, 16)],
    "t3": [(32, 1), (32, 2), (16, 2), (8, 4), (8, 8)],
}

B = 16


def _slope(fn, *args, reps: int = 24) -> float:
    out = fn(*args)
    float(out.sum().astype(jnp.float32))

    def run(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(o.sum().astype(jnp.float32))
        return time.time() - t0

    t1, tn = run(3), run(3 + reps)
    return (tn - t1) / reps


def bench_tier(name: str) -> list:
    H, L, n = TIERS[name]
    rng = np.random.RandomState(0)
    rows = []
    k = jnp.asarray(rng.randn(H, n).astype(np.float32) * .02)
    d = jnp.asarray(rng.randn(H).astype(np.float32))
    for HB, BB in CANDS[name]:
        lay = f2.choose_layout(L, n, H, HB=HB, bf16=True, BB=BB)
        kfr, kfi = jax.jit(
            lambda kk, lay=lay: f2.kernel_spectrum(kk, lay))(k)
        u = jnp.asarray(
            rng.randn(B, lay.S, H, lay.Rc).astype(np.float32) * .1,
            jnp.bfloat16)
        fc = jax.jit(lambda u, kfr, kfi, d, lay=lay:
                     f2.fftconv2_gelu_d(u, kfr, kfi, d, lay, True))
        row = {"tier": name, "HB": HB, "BB": BB,
               "feasible_est": f2.layout_feasible(lay)}
        try:
            t0 = time.time()
            ms = 1000 * _slope(fc, u, kfr, kfi, d)
            row.update(ms=round(ms, 3), compile_s=round(time.time() - t0))
        except Exception as e:
            row.update(error=type(e).__name__, msg=str(e)[:160])
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="t1,t2,t3")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    all_rows = []
    for t in args.tiers.split(","):
        all_rows += bench_tier(t)
    ok = [r for r in all_rows if "ms" in r]
    for t in args.tiers.split(","):
        tr = [r for r in ok if r["tier"] == t]
        if tr:
            best = min(tr, key=lambda r: r["ms"])
            print(f"[best {t}] HB={best['HB']} BB={best['BB']} "
                  f"{best['ms']} ms", flush=True)


if __name__ == "__main__":
    main()
