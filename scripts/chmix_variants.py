"""Isolate where the chmix FF kernel time goes: swapaxes relayout vs
matmul formulation.  Variants (same io, tier1 shapes B16/H128/S128/Rc128):

  v_copy   : out = x (pure io floor)
  v_swap   : out = swapaxes(swapaxes(x,0,1),0,1) (shuffle cost)
  v_ff     : current kernel (swap -> (H,N) matmuls -> swap)
  v_ffbat  : batched dot_general over S_t, no swaps
  v_ffwide : (F, S_t*H) @ (S_t*H, Rc) single matmul, no swap
             (WRONG math - timing only: same FLOPs, K-major shape)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffwave_sashimi_tpu import utils

utils.enable_compile_cache()

B, H, S, Rc = 16, 128, 128, 128
F = 2 * H
St = 16


def slope(fn, *args, reps=30):
    fn(*args).block_until_ready()
    def run(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(o.sum())
        return time.time() - t0
    t2, t8 = run(3), run(3 + reps)
    return (t8 - t2) / reps


def _copy_k(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def _swap_k(x_ref, o_ref):
    t = jnp.swapaxes(x_ref[0], 0, 1)
    o_ref[0] = jnp.swapaxes(t + jnp.bfloat16(1.0), 0, 1)


def _ff_k(x_ref, w1_ref, w2_ref, o_ref):
    xt = x_ref[0]
    t = jnp.swapaxes(xt, 0, 1).reshape(H, St * Rc)
    z = jnp.dot(w1_ref[...], t, preferred_element_type=jnp.float32)
    o = jnp.dot(w2_ref[...], z.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    o_ref[0] = jnp.swapaxes(o.reshape(H, St, Rc), 0, 1).astype(jnp.bfloat16)


def _ffbat_k(x_ref, w1_ref, w2_ref, o_ref):
    xt = x_ref[0]                                   # (St, H, Rc)
    w1b = jnp.broadcast_to(w1_ref[...], (St, F, H))
    z = jax.lax.dot_general(w1b, xt, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    w2b = jnp.broadcast_to(w2_ref[...], (St, H, F))
    o = jax.lax.dot_general(w2b, z.astype(jnp.bfloat16),
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(jnp.bfloat16)


def _ffwide_k(x_ref, w1_ref, w2_ref, o_ref):
    xt = x_ref[0].reshape(St * H, Rc)
    z = jnp.dot(w1_ref[...], xt, preferred_element_type=jnp.float32)
    o = jnp.dot(w2_ref[...], z.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    o_ref[0] = jnp.broadcast_to(o[None, :H, :], (St, H, Rc)
                                ).astype(jnp.bfloat16)


def build(kern, weights):
    io = pl.BlockSpec((1, St, H, Rc), lambda b, s: (b, s, 0, 0),
                      memory_space=pltpu.VMEM)
    specs = [io] + [pl.BlockSpec(w.shape, lambda b, s: (0, 0),
                                 memory_space=pltpu.VMEM) for w in weights]

    @jax.jit
    def f(x, *ws):
        return pl.pallas_call(
            kern, grid=(B, S // St), in_specs=specs, out_specs=io,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, *ws)
    return f


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * .3,
                    jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(F, H).astype(np.float32) * .05, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(H, F).astype(np.float32) * .05, jnp.bfloat16)
    w1w = jnp.asarray(rng.randn(F, St * H).astype(np.float32) * .05,
                      jnp.bfloat16)
    w2w = jnp.asarray(rng.randn(H, F).astype(np.float32) * .05, jnp.bfloat16)

    for name, fn, args in [
        ("copy", build(_copy_k, []), (x,)),
        ("swap", build(_swap_k, []), (x,)),
        ("ff  ", build(_ff_k, [w1, w2]), (x, w1, w2)),
        ("ffbat", build(_ffbat_k, [w1, w2]), (x, w1, w2)),
        ("ffwide", build(_ffwide_k, [w1w, w2w]), (x, w1w, w2w)),
    ]:
        try:
            t = slope(fn, *args)
            gf = 2 * B * S * Rc * 2 * H * F / 1e9
            print(f"{name}: {t*1e3:7.3f} ms"
                  + (f"  ({gf/t/1e3:5.0f} TF/s)" if "ff" in name else ""),
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
