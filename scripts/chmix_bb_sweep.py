"""Sweep the ln_ff batch-interleave factor (chmix.ln_ff_res ``bb``).

Round-3 found Mosaic overlaps independent per-batch chains inside one
program for the fused conv (fftconv2 lay.BB=2 at HB=8); this measures
whether the same ILP trick pays for the LN+FF+residual kernel, per tier
of the d128 SaShiMi sampling step, and validates each variant against
the XLA reference first.

Usage: python scripts/chmix_bb_sweep.py [B]
"""
import sys
import time

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.utils import enable_compile_cache
from diffwave_sashimi_tpu.ops import chmix

enable_compile_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
TIERS = [  # (S, H, Rc, nblk) of the d128/L16000 step (BASELINE.md)
    (128, 128, 128, 12),
    (32, 256, 128, 12),
    (8, 512, 128, 6),
]


def timed(fn, args, K):
    o = None
    t0 = time.time()
    for _ in range(K):
        o = fn(*args)
    float(o[0].sum() if isinstance(o, (tuple, list)) else o.sum())
    return time.time() - t0


def main():
    print(f"backend={jax.default_backend()} B={B}")
    for S, H, Rc, nblk in TIERS:
        key = jax.random.PRNGKey(S)
        ks = jax.random.split(key, 8)
        F = 2 * H
        x = jax.random.normal(ks[0], (B, S, H, Rc), jnp.bfloat16)
        skip = jax.random.normal(ks[1], (B, S, H, Rc), jnp.bfloat16)
        m = jnp.full((1,), 0.1, jnp.float32)
        s = jnp.full((1,), 1.1, jnp.float32)
        w1 = jax.random.normal(ks[2], (F, H), jnp.float32) * (H ** -0.5)
        b1 = jax.random.normal(ks[3], (F,), jnp.float32) * 0.1
        w2 = jax.random.normal(ks[4], (H, F), jnp.float32) * (F ** -0.5)
        b2 = jax.random.normal(ks[5], (H,), jnp.float32) * 0.1

        ref = jax.jit(lambda *a: chmix.ln_ff_res_ref(*a, emit_stats=True))(
            x, m, s, w1, b1, w2, b2, skip)
        ref = [jnp.asarray(r, jnp.float32) for r in ref]

        base = None
        for bb in (1, 2, 4):
            if B % bb:
                continue
            fn = jax.jit(lambda x_, m_, s_, w1_, b1_, w2_, b2_, sk_, _bb=bb:
                         chmix.ln_ff_res(x_, m_, s_, w1_, b1_, w2_, b2_,
                                         fast=True, emit_stats=True,
                                         bb=_bb, skip=sk_))
            try:
                out = fn(x, m, s, w1, b1, w2, b2, skip)
            except Exception as e:
                print(f"S={S:4d} H={H:4d} bb={bb}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}")
                continue
            errs = [float(jnp.max(jnp.abs(jnp.asarray(o, jnp.float32) - r)))
                    for o, r in zip(out, ref)]
            # slope timing: K=2 vs K=8 isolates per-run compute from the
            # (noisy) D2H readback
            t2 = timed(fn, (x, m, s, w1, b1, w2, b2, skip), 2)
            t8 = timed(fn, (x, m, s, w1, b1, w2, b2, skip), 8)
            ms = max(t8 - t2, 1e-9) / 6 * 1e3
            if bb == 1:
                base = ms
            rel = f" ({ms / base:.2f}x vs bb=1)" if base else ""
            print(f"S={S:4d} H={H:4d} bb={bb}: {ms:7.3f} ms"
                  f"  err_out={errs[0]:.2e} err_stats={max(errs[1:]):.2e}"
                  f"  step-total {ms * nblk:6.2f} ms{rel}")


if __name__ == "__main__":
    main()
