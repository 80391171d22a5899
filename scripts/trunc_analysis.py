#!/usr/bin/env python
"""Cost model: does kernel truncation + overlap-save beat the exact conv?

VERDICT r3 named "kernel truncation + overlap-save (~2-3x fewer conv
FLOPs)" as a route past the exact-bf16 serial floor.  That estimate is
FFT-economics (O(n log n)): truncating the kernel to K << L lets each
output chunk use an FFT of size ~C+K instead of 2L.  But the TPU conv is
the FOUR-STEP MATMUL formulation (ops/fftconv2.py), whose cost is
    8 * n * (Rc + S)   FLOP/channel,   n = FFT size, Rc*S >= valid len,
minimized at S ~ sqrt(L) (so cost ~ 16 * n / sqrt(n) * ... ~ n^{1/2}
per sample, NOT log n).  Chunking to n_c = C + K re-pays the sqrt
economics per chunk, so the win is far smaller than log-economics
intuition suggests.  This script enumerates (K, C) with the REAL layout
chooser and prints the achievable FLOP ratio vs exact, plus the program
-count multiplier (launch overhead: small-S tiers are launch-bound,
BASELINE.md round-3).

Result (d128 SC09 tiers, run this script): at a quality-plausible
K >= 2048 the best ratio is 0.84x and only on the top tier (3x the
program count); the pooled tiers get NO win (1.0-1.7x at any K) because
their exact n is already small.  The aggressive K = 512 reaches 0.53x
on tier 1 — but at 32x the program count (small-S tiers are
launch-bound, BASELINE.md round-3) and a 512-tap truncation of a
16000-tap S4 kernel (the dt_min = 0.001 modes decay with time constant
~2000 samples — the tail is NOT negligible).  Conclusion: truncation +
overlap-save is NOT a lever for this formulation — the floor-halving
lever is int8 MXU (scripts/int8_probe).  Documented negative result;
no kernel work follows from it.
"""

import math
import sys

sys.path.insert(0, ".")

from diffwave_sashimi_tpu.ops.fftconv2 import choose_layout  # noqa: E402


def conv_flops(lay):
    """Matmul FLOPs per channel per program chain (matches
    ops/fftconv2._conv2_impl's flops_mm / HB)."""
    S, Rc, R, Q = lay.S, lay.Rc, lay.R, lay.Q
    return 2 * (2 * S * Rc * R + 4 * Q * S * R + 4 * S * Q * R
                + 2 * S * R * Rc)


def exact_cost(L):
    n = 1 << (2 * L - 1).bit_length()
    lay = choose_layout(L, n, 128)
    return conv_flops(lay), 1, lay


def overlap_save_cost(L, K, C):
    """Truncated kernel K, output chunk C: each chunk convolves C+K-1
    input samples at FFT size next_pow2(C+K)."""
    n_c = 1 << (C + K - 1).bit_length()
    if n_c < 256:
        return None
    chunks = math.ceil(L / C)
    try:
        lay = choose_layout(C + K, n_c, 128)
    except AssertionError:
        return None
    return conv_flops(lay) * chunks, chunks, lay


def main():
    print(f"{'L':>6} {'K':>6} {'C':>6} {'n_c':>6} {'ratio':>6} "
          f"{'programs x':>10}")
    for L in (16000, 4000, 1000):
        base, _, lay0 = exact_cost(L)
        print(f"{L:>6}  exact: n={lay0.n} S={lay0.S} Rc={lay0.Rc} "
              f"flops/ch={base/1e6:.1f}M")
        for K in (512, 1024, 2048, 4096, 8000):
            if K >= L:
                continue
            best = None
            for log_c in range(9, 15):
                C = (1 << log_c) - K
                if C <= 0:
                    continue
                r = overlap_save_cost(L, K, C)
                if r is None:
                    continue
                cost, chunks, lay = r
                if best is None or cost < best[0]:
                    best = (cost, chunks, C, lay)
            if best is None:
                continue
            cost, chunks, C, lay = best
            print(f"{L:>6} {K:>6} {C:>6} {lay.n:>6} {cost / base:>6.2f} "
                  f"{chunks:>10}")


if __name__ == "__main__":
    main()
