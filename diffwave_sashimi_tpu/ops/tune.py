"""Pallas Cauchy kernel autotuner + microbenchmark harness.

TPU replacement for the reference's CUDA kernel tuning stack
(extensions/cauchy/{tuner,tune_cauchy,benchmark_cauchy*}.py): where the
reference #define-injects ITEMS_PER_THREAD/BLOCK_SIZE values, recompiles and
reinstalls the extension per configuration (tuner.py:34-37, 135-182), here a
configuration is just a (BM, BL) grid/block choice — sweep, time with
``block_until_ready``, dump JSON.

Usage:
    python -m diffwave_sashimi_tpu.ops.tune                 # default sweep
    python -m diffwave_sashimi_tpu.ops.tune --quick         # 1 operating pt

The reference benchmark operating point (bs=1024, N=64, L=16384,
benchmark_cauchy.py:29-37) is included alongside the shapes this framework
actually runs (S4 kernel construction for the SC09 models).
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cauchy_pallas
from .cauchy import cauchy_sym

# Operating points: (label, batch_dims..., H, N_half, L)
OPERATING_POINTS = [
    ("ref_bench_point", (1024,), 1, 32, 16384),     # reference bs1024/N64/L16k
    ("sc09_d128_outer", (2, 3), 128, 32, 8001),     # training L'=L/2+1
    ("sc09_d128_mid", (2, 3), 256, 32, 2001),
    ("sc09_d128_inner", (2, 3), 512, 32, 501),
    ("sc09_d64_outer", (2, 3), 64, 32, 8001),
]

BM_CANDIDATES = [8, 16, 32]
BL_CANDIDATES = [256, 512, 1024, 2048]


def _make_inputs(batch_dims: Tuple[int, ...], H: int, N: int, L: int):
    rng = np.random.RandomState(0)
    shape = tuple(batch_dims) + (H, N)
    v = jnp.asarray((rng.randn(*shape) + 1j * rng.randn(*shape))
                    .astype(np.complex64))
    w = jnp.asarray((-np.abs(rng.randn(H, N)) + 1j * rng.randn(H, N))
                    .astype(np.complex64))
    z = jnp.asarray((1j * rng.randn(L)).astype(np.complex64))
    return v, z, w


def _time(fn, *args, reps: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def bench_point(label: str, batch_dims, H: int, N: int, L: int,
                tune: bool = True) -> Dict:
    v, z, w = _make_inputs(batch_dims, H, N, L)
    rec: Dict = {"point": label, "batch_dims": list(batch_dims),
                 "H": H, "N_half": N, "L": L}

    xla_fn = jax.jit(lambda v, z, w: cauchy_sym(v, z, w))
    rec["xla_ms"] = 1000 * _time(xla_fn, v, z, w)

    results = []
    candidates = ([(cauchy_pallas.BM, cauchy_pallas.BL)] if not tune else
                  [(bm, bl) for bm in BM_CANDIDATES for bl in BL_CANDIDATES])
    orig = (cauchy_pallas.BM, cauchy_pallas.BL)
    try:
        for bm, bl in candidates:
            cauchy_pallas.BM, cauchy_pallas.BL = bm, bl
            fn = jax.jit(cauchy_pallas.cauchy_sym_pallas)
            try:
                ms = 1000 * _time(fn, v, z, w)
                results.append({"BM": bm, "BL": bl, "ms": round(ms, 4)})
            except Exception as e:
                results.append({"BM": bm, "BL": bl,
                                "error": type(e).__name__})
    finally:
        cauchy_pallas.BM, cauchy_pallas.BL = orig

    ok = [r for r in results if "ms" in r]
    rec["pallas"] = results
    if ok:
        best = min(ok, key=lambda r: r["ms"])
        rec["best"] = best
        rec["speedup_vs_xla"] = round(rec["xla_ms"] / best["ms"], 2)
    return rec


# ---------------------------------------------------------------------------
# Fused-conv (HB, BB) sweep: the v2 layout's channels-per-program and
# batch-interleave factors.  Slope-timed with a forced D2H per chain
# (block_until_ready does NOT reliably wait on this backend — CLAUDE.md
# facts 5/13); only within-run comparisons are meaningful (tunnel load
# drifts ±25% between processes).

# (label, H, L, n) — the SC09 d128 tiers + the LJSpeech-harder top tier
CONV_TIERS = [
    ("sc09_d128_t1", 128, 16000, 32768),
    ("sc09_d128_t2", 256, 4000, 8192),
    ("sc09_d128_t3", 512, 1000, 2048),
    ("ljs_harder_top", 32, 44000, 131072),
]


def _slope(fn, *args, reps: int = 20) -> float:
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


def bench_conv_tier(label: str, H: int, L: int, n: int,
                    B: int = 16) -> Dict:
    from . import fftconv2 as f2
    rng = np.random.RandomState(0)
    rec: Dict = {"point": label, "H": H, "L": L, "n": n, "B": B}
    results = []
    default_lay = f2.choose_layout(L, n, H, bf16=True)
    rec["default"] = {"HB": default_lay.HB, "BB": default_lay.BB}
    for HB in (1, 8, 16, 32):
        if H % HB:
            continue
        for BB in (1, 2, 4, 8):
            if B % BB:
                continue
            lay = f2.choose_layout(L, n, H, HB=HB, bf16=True, BB=BB)
            if not f2.layout_feasible(lay):
                continue
            k = jnp.asarray(rng.randn(H, n).astype(np.float32) * .02)
            kfr, kfi = jax.jit(
                lambda kk, lay=lay: f2.kernel_spectrum(kk, lay))(k)
            d = jnp.asarray(rng.randn(H).astype(np.float32))
            u = jnp.asarray(
                rng.randn(B, lay.S, H, lay.Rc).astype(np.float32) * .1,
                jnp.bfloat16)
            # pass the spectra/D as ARGUMENTS, not jit-closure constants
            # (CLAUDE.md axon fact 3: closed-over device arrays get
            # embedded and read back host-side at lowering, ~90-250s for
            # the first one)
            fc = jax.jit(lambda u, kfr, kfi, d, lay=lay:
                         f2.fftconv2_gelu_d(u, kfr, kfi, d, lay, True))
            try:
                ms = 1000 * _slope(fc, u, kfr, kfi, d)
                gf = B * H * 8 * lay.n * (lay.Rc + lay.S) / 1e9
                results.append({"HB": HB, "BB": BB, "ms": round(ms, 3),
                                "tf_s": round(gf / ms, 1)})
            except Exception as e:
                results.append({"HB": HB, "BB": BB,
                                "error": type(e).__name__})
            print(json.dumps({**rec, **results[-1]}), flush=True)
    ok = [r for r in results if "ms" in r]
    rec["sweep"] = results
    if ok:
        rec["best"] = min(ok, key=lambda r: r["ms"])
    return rec


def conv_main(out: str, quick: bool) -> None:
    tiers = CONV_TIERS[:1] if quick else CONV_TIERS
    records = [bench_conv_tier(*t) for t in tiers]
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": records},
                  f, indent=2)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="single operating point, no block sweep")
    ap.add_argument("--conv", action="store_true",
                    help="sweep the fused-conv (HB, BB) layout factors "
                         "instead of the Cauchy blocks")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.conv:
        conv_main(args.out or "conv_tune.json", args.quick)
        return
    args.out = args.out or "cauchy_tune.json"

    points = OPERATING_POINTS[1:2] if args.quick else OPERATING_POINTS
    records: List[Dict] = []
    for point in points:
        rec = bench_point(*point, tune=not args.quick)
        print(json.dumps(rec), flush=True)
        records.append(rec)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": records},
                  f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
