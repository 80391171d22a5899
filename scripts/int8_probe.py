#!/usr/bin/env python
"""Probe: is int8 MXU a real 2x over bf16 on this chip, and does an
in-kernel (Pallas) quantize->int8-dot->dequant chain lower and pay?

Three measurements (slope-timed, forced D2H per CLAUDE.md fact 5):
  1. XLA matmul throughput: bf16 vs int8 vs f32-HIGHEST at 4096^3.
  2. Pallas kernel: a conv-stage-shaped chain (S*HB, Rc)@(Rc, R) with
     (a) bf16 operands and (b) in-kernel dynamic per-tile int8 quantize
     of the activation against a pre-quantized int8 constant.
  3. Numerics of (b) vs an f64 numpy oracle.

Decision input for the int8 fused-conv lever (VERDICT r3 #3/#5): the
serial floor (scripts/serial_floor.py) is all MXU terms, so 2x int8 MXU
halves the floor — IF the quantize VPU overhead doesn't eat the gain in
a chain that is already ~half VPU (BASELINE.md round-2 findings).
"""

import time

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def slope(fn, *args):
    def timed(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        float(jnp.sum(o.astype(jnp.float32)))
        return time.time() - t0
    timed(1)
    for _ in range(3):
        t2, t6 = timed(2), timed(6)
        ms = (t6 - t2) / 4 * 1000
        if ms > 0:
            return ms
    return ms


def xla_matmul_tflops():
    M = 4096
    rng = np.random.RandomState(0)
    a32 = jnp.asarray(rng.randn(M, M).astype(np.float32))
    b32 = jnp.asarray(rng.randn(M, M).astype(np.float32))
    a8 = jnp.asarray(rng.randint(-127, 128, (M, M), dtype=np.int8))
    b8 = jnp.asarray(rng.randint(-127, 128, (M, M), dtype=np.int8))
    flops = 2 * M * M * M / 1e12

    f_bf16 = jax.jit(lambda a, b: jnp.dot(a.astype(jnp.bfloat16),
                                          b.astype(jnp.bfloat16),
                                          preferred_element_type=jnp.float32))
    f_int8 = jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.int32))
    for name, f, args in (("bf16", f_bf16, (a32, b32)),
                          ("int8", f_int8, (a8, b8))):
        try:
            ms = slope(f, *args)
            print(f"[xla] {name} {M}^3 matmul: {ms:.3f} ms "
                  f"= {flops / (ms / 1e3):.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"[xla] {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


# ---- Pallas stage-chain probe ----------------------------------------
# A DEPENDENT chain of CH matmuls (each stage consumes the previous
# stage's output), mirroring the four-step conv's serial structure: the
# int8 variant must re-quantize EVERY stage input with a fresh dynamic
# scale, exactly as the real kernel would — that VPU cost is the open
# question, not the int8 dot itself.
S_HB, RC, R, CH = 1024, 256, 256, 8


def _bf16_kernel(x_ref, d_ref, o_ref):
    y = x_ref[:].astype(jnp.bfloat16)
    for _ in range(CH):
        y = jnp.dot(y, d_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    o_ref[:] = y.astype(jnp.float32)


def _int8_kernel(x_ref, d8_ref, o_ref, *, dscale: float):
    y = x_ref[:]
    for _ in range(CH):
        sa = jnp.max(jnp.abs(y)) / 127.0
        q = jnp.round(y / sa).astype(jnp.int8)
        y = (jnp.dot(q, d8_ref[:], preferred_element_type=jnp.int32)
             .astype(jnp.float32) * (sa * dscale))
    o_ref[:] = y


def pallas_chain():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(S_HB, RC).astype(np.float32))
    # unit-ish spectral norm so the 8-deep chain neither explodes nor decays
    d = (rng.randn(RC, R) / np.sqrt(RC)).astype(np.float32)
    dscale = float(np.max(np.abs(d)) / 127.0)
    d8 = jnp.asarray(np.round(d / dscale).astype(np.int8))
    d_j = jnp.asarray(d)

    spec = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,  # noqa
                                  memory_space=pltpu.VMEM)
    f_bf = jax.jit(lambda xx, dd: pl.pallas_call(
        _bf16_kernel, in_specs=[spec(x), spec(d_j)], out_specs=spec(
            jax.ShapeDtypeStruct((S_HB, R), jnp.float32)),
        out_shape=jax.ShapeDtypeStruct((S_HB, R), jnp.float32))(xx, dd))
    f_i8 = jax.jit(lambda xx, dd: pl.pallas_call(
        functools.partial(_int8_kernel, dscale=dscale),
        in_specs=[spec(x), spec(d8)], out_specs=spec(
            jax.ShapeDtypeStruct((S_HB, R), jnp.float32)),
        out_shape=jax.ShapeDtypeStruct((S_HB, R), jnp.float32))(xx, dd))

    oracle = np.asarray(x, np.float64)
    for _ in range(CH):
        oracle = oracle @ np.asarray(d, np.float64)
    for name, f, dd in (("bf16", f_bf, d_j), ("int8", f_i8, d8)):
        try:
            y = np.asarray(f(x, dd), np.float64)
            rel = np.max(np.abs(y - oracle)) / np.max(np.abs(oracle))
            ms = slope(f, x, dd)
            tf = 2 * S_HB * RC * R * CH / 1e12 / (ms / 1e3)
            print(f"[pallas] {name}: {ms:.4f} ms = {tf:.1f} TFLOP/s, "
                  f"rel err {rel:.2e}", flush=True)
        except Exception as e:
            print(f"[pallas] {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    xla_matmul_tflops()
    pallas_chain()
