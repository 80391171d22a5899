#!/usr/bin/env python
"""Bisect which stage of the fftconv2 kernel crashes the Mosaic compiler."""

import functools
import sys

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from diffwave_sashimi_tpu.ops import fftconv2 as f2  # noqa: E402

STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"

L, n, B, H = 1000, 2048, 2, 16
lay = f2.choose_layout(L, n, H)
S, R, Rc, HB = lay.S, lay.R, lay.Rc, lay.HB
G = H // HB
print(f"lay={lay} stage={STAGE}", flush=True)

c = f2._consts(lay)
rng = np.random.RandomState(0)
u5 = jnp.asarray(rng.randn(B, G, HB, S, Rc).astype(np.float32))
kfr = jnp.asarray(rng.randn(G, S // 2, HB, R).astype(np.float32))
kfi = jnp.asarray(rng.randn(G, S // 2, HB, R).astype(np.float32))
knyq = jnp.asarray(rng.randn(G, HB, 1).astype(np.float32))

const_names = ["Drr", "Dri", "twr", "twi", "Dsr", "Dsi", "Esr", "Esi",
               "twmr", "twmi", "Err", "Eri", "mask"]
const_arrays = [jnp.asarray(c[k]) for k in const_names]
const_arrays.append(jnp.asarray(c["sgn"]).reshape(S, 1))
const_specs = [
    pl.BlockSpec(a.shape, lambda g, b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    for a in const_arrays]


def kern(u_ref, kfr_ref, kfi_ref, knyq_ref,
         drr, dri, twr, twi, dsr, dsi, esr, esi, twmr, twmi, err, eri,
         mask_ref, sgn_ref, out_ref):
    f32 = jnp.float32
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
    mask = mask_ref[:, :]
    x = u_ref[0, 0].astype(f32) * mask
    if STAGE == "s1_only":
        xm = x.reshape(HB * S, Rc)
        Ar = mm(xm, drr[:, :])
        out_ref[0, 0] = Ar[:, :Rc].reshape(HB, S, Rc)
        return
    xm = x.reshape(HB * S, Rc)
    Ar = mm(xm, drr[:, :]).reshape(HB, S, R)
    Ai = mm(xm, dri[:, :]).reshape(HB, S, R)
    tr, ti = twr[:, :], twi[:, :]
    Br = Ar * tr - Ai * ti
    Bi = Ar * ti + Ai * tr
    if STAGE == "tw":
        out_ref[0, 0] = Br[..., :Rc]
        return
    Bpr = jnp.swapaxes(Br, 0, 1).reshape(S, HB * R)
    Bpi = jnp.swapaxes(Bi, 0, 1).reshape(S, HB * R)
    Xr = mm(dsr[:, :], Bpr) - mm(dsi[:, :], Bpi)
    Xi = mm(dsr[:, :], Bpi) + mm(dsi[:, :], Bpr)
    if STAGE == "s2":
        out_ref[0, 0] = jnp.swapaxes(
            Xr.reshape(S // 2, HB, R), 0, 1)[:, :, :Rc].repeat(2, 1)
        return
    Kr = kfr_ref[0].reshape(S // 2, HB * R)
    Ki = kfi_ref[0].reshape(S // 2, HB * R)
    Yr = Xr * Kr - Xi * Ki
    Yi = Xr * Ki + Xi * Kr
    Zr = mm(esr[:, :], Yr) - mm(esi[:, :], Yi)
    Zi = mm(esr[:, :], Yi) + mm(esi[:, :], Yr)
    Zr = Zr.reshape(S, HB, R)
    Zi = Zi.reshape(S, HB, R)
    tmr = twmr[:, :][:, None, :]
    tmi = twmi[:, :][:, None, :]
    Tr = Zr * tmr - Zi * tmi
    Ti = Zr * tmi + Zi * tmr
    Tmr = jnp.swapaxes(Tr, 0, 1).reshape(HB * S, R)
    Tmi = jnp.swapaxes(Ti, 0, 1).reshape(HB * S, R)
    y = mm(Tmr, err[:, :]) - mm(Tmi, eri[:, :])
    y = y.reshape(HB, S, Rc)
    if STAGE == "ib":
        out_ref[0, 0] = y * mask
        return
    sgn = sgn_ref[:, :]
    xn = jnp.sum(x * sgn[None, :, :1], axis=(1, 2), keepdims=True)
    kn = knyq_ref[0][:, :, None]
    y = y + sgn[None, :, :1] * (xn * kn)
    out_ref[0, 0] = y * mask


out = pl.pallas_call(
    kern,
    grid=(G, B),
    in_specs=[
        pl.BlockSpec((1, 1, HB, S, Rc), lambda g, b: (b, g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S // 2, HB, R), lambda g, b: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S // 2, HB, R), lambda g, b: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HB, 1), lambda g, b: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + const_specs,
    out_specs=pl.BlockSpec((1, 1, HB, S, Rc), lambda g, b: (b, g, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, G, HB, S, Rc), jnp.float32),
)(u5, kfr, kfi, knyq, *const_arrays)
print("compiled+ran ok:", float(out.sum()), flush=True)
