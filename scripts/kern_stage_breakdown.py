#!/usr/bin/env python
"""Locate the S4 kernel-construction cost (the batch-independent ~100 ms
fixed share of the train step) BETWEEN stages and WITHIN the chain.

Round-4 closed the precision lever (construction is not FFT-matmul
bound); the round-5 question is *where* the isolated ~60 ms
(kern_ablation fwd+bwd) actually goes:

  per-stage    construction of each UNet stage alone (d0/d1/c/u0/u1,
               vmapped over its 6 blocks) — if the sum of stages is well
               below the all-stages time, the cost is program-level
               scheduling, and merging same-tier stages (d0+u1, d1+u0)
               into one wide vmap is the fix;
  cauchy-only  the Pallas cauchy kernel at each tier's exact shapes,
               fwd and fwd+bwd — bounds how much of a stage is the
               irreducible VPU rational-function evaluation.

Slope-timed with forced D2H (CLAUDE.md facts 5, 13); compare only
within this run (tunnel load variance is ±25% across sessions).
"""

import time

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffwave_sashimi_tpu.models.sashimi import (DiffWaveBlock,  # noqa: E402
                                                 Sashimi)
from diffwave_sashimi_tpu.ops.cauchy_pallas import cauchy_sym_pallas  # noqa: E402

D, L = 128, 16000


def slope(fn, *args):
    def timed(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        jax.tree.leaves(o)[0].block_until_ready()
        float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        return time.time() - t0
    timed(1)
    for _ in range(3):
        t2, t6 = timed(2), timed(6)
        ms = (t6 - t2) / 4 * 1000
        if ms > 0:
            return ms
    return ms


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    model = Sashimi(d_model=D, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    bound = model.bind(params)
    all_params = params["params"]

    def reduce_tree(t):
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree.leaves(t))

    # ---- per-stage construction (exactly what compute_kernels runs) ----
    stage_fns = {}
    for name, H, Lt, Lg in bound._scan_stage_info(L):
        tmpl = bound._block_template(H, Lt)
        stacked = all_params[name]["block"]

        def one(p, tmpl=tmpl, Lg=Lg):
            return tmpl.apply({"params": p}, Lg,
                              method=DiffWaveBlock.compute_kernel_v2)

        def fwd(s, one=one):
            return jax.vmap(one)(s)

        def fwd_bwd(s, fwd=fwd):
            out, pull = jax.vjp(fwd, s)
            (g,) = pull(jax.tree.map(jnp.ones_like, out))
            return reduce_tree(g)

        stage_fns[name] = (fwd, fwd_bwd, stacked, H, Lg)

    total_f = total_fb = 0.0
    for name, (fwd, fwd_bwd, stacked, H, Lg) in stage_fns.items():
        f = slope(jax.jit(fwd), stacked)
        fb = slope(jax.jit(fwd_bwd), stacked)
        total_f += f
        total_fb += fb
        print(f"[stage {name:10s}] H={H:4d} L={Lg:6d}  "
              f"fwd {f:6.2f} ms   fwd+bwd {fb:6.2f} ms", flush=True)
    print(f"[stages summed ]              fwd {total_f:6.2f} ms   "
          f"fwd+bwd {total_fb:6.2f} ms", flush=True)

    # ---- full compute_kernels, stage-merge OFF vs ON (same session) ----
    from diffwave_sashimi_tpu.models import sashimi as sashimi_mod
    for merge in (False, True):
        sashimi_mod.MERGE_STAGES["enabled"] = merge

        # fresh function objects per mode: jit keys on function identity
        def ck(p, _m=merge):
            return model.apply(p, L, "v2", method=Sashimi.compute_kernels)

        def ck_fb(p, ck=ck):
            out, pull = jax.vjp(ck, p)
            (g,) = pull(jax.tree.map(jnp.ones_like, out))
            return reduce_tree(g)

        f = slope(jax.jit(ck), params)
        fb = slope(jax.jit(ck_fb), params)
        print(f"[all-stages merge={int(merge)}]      fwd {f:6.2f} ms   "
              f"fwd+bwd {fb:6.2f} ms", flush=True)
    sashimi_mod.MERGE_STAGES["enabled"] = True

    # ---- cauchy kernel alone at each tier's exact shapes ----
    rs = np.random.RandomState(0)
    for (H, Lg, nl) in ((128, 16000, 12), (256, 4000, 12), (512, 1000, 6)):
        N2 = 32
        Lp = Lg // 2 + 1
        # complex H2D is UNIMPLEMENTED on this backend (CLAUDE.md fact 7):
        # ship f32 planes, combine on device; z embeds as a trace constant
        vr = jnp.asarray(rs.randn(nl, 2, 3, H, N2).astype("float32"))
        vi = jnp.asarray(rs.randn(nl, 2, 3, H, N2).astype("float32"))
        wr = jnp.asarray(-np.abs(rs.randn(nl, H, N2)).astype("float32") * .1)
        wi = jnp.asarray(rs.randn(nl, H, N2).astype("float32") * 0.1)
        om = np.exp(-2j * np.pi / Lg) ** np.arange(Lp)
        z_np = (2 * (1 - om) / (1 + om)).astype("complex64")

        def cfwd(vr, vi, wr, wi, z_np=z_np):
            v = jax.lax.complex(vr, vi)
            w = jax.lax.complex(wr, wi)
            z = jnp.asarray(z_np)
            r = jax.vmap(lambda vv, ww: cauchy_sym_pallas(vv, z, ww))(v, w)
            return jnp.stack([r.real, r.imag])

        def cfb(vr, vi, wr, wi, cfwd=cfwd):
            out, pull = jax.vjp(cfwd, vr, vi, wr, wi)
            gs = pull(jnp.ones_like(out))
            return sum(jnp.sum(jnp.abs(g)) for g in gs)

        f = slope(jax.jit(cfwd), vr, vi, wr, wi)
        fb = slope(jax.jit(cfb), vr, vi, wr, wi)
        print(f"[cauchy {nl:2d}x H={H:4d} L'={Lp:5d}]  fwd {f:6.2f} ms   "
              f"fwd+bwd {fb:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
