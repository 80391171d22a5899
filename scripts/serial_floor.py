#!/usr/bin/env python
"""Structural serial-floor analysis of the T=200 sampling step
(sashimi d128 SC09, the BASELINE.md headline point).

Computes per-op lower bounds — MXU time at the v5e bf16 peak and HBM
time at peak bandwidth, taking the max per op — for every kernel in the
fully-fused sampling step, then multiplies by the network's op counts.
This is the PROOF side of the >=20x target discussion: no schedule of
the existing ops can beat the floor; beating it requires changing the
math (int8 MXU, kernel truncation + different factorization, a smaller
model) rather than better fusion.

All analytic numbers; cross-checked against measured per-kernel times
from /tmp/bbhb_sweep.log (2026-08-17) where available.
"""

import json

# v5e (one chip)
PEAK_BF16 = 197e12   # FLOP/s (MXU, bf16)
PEAK_HBM = 819e9     # B/s
SR = 16000.0

B, D, L, T = 16, 128, 16000, 200


def conv_floor(Bc, H, Lt, n, S, Rc, measured_ms=None):
    """Fused v2 conv: four MXU matmul stages, 8*n*(Rc+S) FLOP/channel."""
    flops = Bc * H * 8 * n * (Rc + S)
    # io: read + write the (B, S, H, Rc) bf16 activation once
    hbm = 2 * Bc * S * H * Rc * 2
    return dict(flops=flops, t_mxu=flops / PEAK_BF16,
                t_hbm=hbm / PEAK_HBM,
                t=max(flops / PEAK_BF16, hbm / PEAK_HBM),
                measured_ms=measured_ms)


def chmix_floor(Bc, H, Lt, fin, fout_list):
    """Channel matmuls (GLU mix / FF): sum of (H_in x H_out) matmuls over
    B*L positions, bf16, plus one activation read+write."""
    flops = sum(2 * Bc * Lt * a * b for a, b in fout_list)
    hbm = 2 * Bc * Lt * fin * 2
    return dict(flops=flops, t_mxu=flops / PEAK_BF16,
                t_hbm=hbm / PEAK_HBM,
                t=max(flops / PEAK_BF16, hbm / PEAK_HBM))


def main():
    # tiers of sashimi d128 n6 pool(4,4): (H, L, n, S, Rc, blocks)
    tiers = [
        (128, 16000, 32768, 128, 128, 12),   # d0 + u1
        (256, 4000, 8192, 32, 128, 12),      # d1 + u0
        (512, 1000, 2048, 8, 128, 6),        # center
    ]
    total = 0.0
    rows = []
    for H, Lt, n, S, Rc, blocks in tiers:
        conv = conv_floor(B, H, Lt, n, S, Rc)
        # per block: GLU mix (H -> 2H gated to H) + FF (H -> 2H -> H... the
        # sashimi ff=2 block is H -> 2H gelu -> H)
        glu = chmix_floor(B, H, Lt, H, [(H, 2 * H)])
        ff = chmix_floor(B, H, Lt, H, [(H, 2 * H), (2 * H, H)])
        t_block = conv["t"] + glu["t"] + ff["t"]
        rows.append((H, Lt, blocks, conv["t"] * 1e3, glu["t"] * 1e3,
                     ff["t"] * 1e3, t_block * 1e3))
        total += blocks * t_block
    # pools, init/final convs, step embedding, noise update: HBM passes
    # over the activations (~6 full-tier1 passes, generous)
    misc = 6 * (2 * B * 128 * 16000 * 2) / PEAK_HBM
    total += misc

    print(f"{'H':>4} {'L':>6} {'nblk':>4} {'conv':>7} {'glu':>7} "
          f"{'ff':>7} {'block':>8}  (ms floor, B=16)")
    for H, Lt, bl, c, g, f, t in rows:
        print(f"{H:4d} {Lt:6d} {bl:4d} {c:7.3f} {g:7.3f} {f:7.3f} {t:8.3f}")
    print(f"misc (pools/head/update, HBM): {misc*1e3:.2f} ms")
    step_ms = total * 1e3
    rt = B * (L / SR) / (T * total)
    print(f"step floor: {step_ms:.1f} ms  =>  {rt:.2f}x realtime at T=200")
    print(json.dumps({"step_floor_ms": round(step_ms, 2),
                      "x_realtime_ceiling_T200_B16": round(rt, 2)}))


if __name__ == "__main__":
    main()
