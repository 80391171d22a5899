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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="single operating point, no block sweep")
    ap.add_argument("--out", default="cauchy_tune.json")
    args = ap.parse_args()

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
