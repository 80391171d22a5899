"""Fused WaveNet gate+res/skip tail (ops/wavenet_gate): interpret-mode
kernel vs the XLA reference and vs the unfused block math."""

import numpy as np

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.ops.wavenet_gate import (_pick_lt, gate_res_skip,
                                                   gate_res_skip_ref)


def _data(B=2, C=16, S=8, L=256, seed=0):
    rng = np.random.RandomState(seed)
    h = rng.randn(B, 2 * C, L).astype(np.float32)
    x = rng.randn(B, C, L).astype(np.float32) * 0.3
    wr = rng.randn(C, C).astype(np.float32) * 0.2
    br = rng.randn(C).astype(np.float32) * 0.1
    ws = rng.randn(S, C).astype(np.float32) * 0.2
    bs = rng.randn(S).astype(np.float32) * 0.1
    return map(jnp.asarray, (h, x, wr, br, ws, bs))


def test_pick_lt():
    # lane blocks must be 128-divisible (Mosaic) AND divide L
    assert _pick_lt(16000) == 640
    assert _pick_lt(512) == 512
    assert _pick_lt(4096) == 2048
    assert 16000 % _pick_lt(16000) == 0
    assert _pick_lt(123) == 123   # full-array fallback


def test_gate_kernel_matches_ref():
    h, x, wr, br, ws, bs = _data()
    res_k, skip_k = gate_res_skip(h, x, wr, br, ws, bs, fast=False)
    res_r, skip_r = gate_res_skip_ref(h, x, wr, br, ws, bs)
    np.testing.assert_allclose(np.asarray(res_k), np.asarray(res_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_r),
                               atol=1e-5, rtol=1e-5)


def test_gate_ref_matches_block_math():
    """The reference itself equals the unfused block formulation
    (reference models/wavenet.py:103-121)."""
    import math
    h, x, wr, br, ws, bs = _data(seed=1)
    C = x.shape[1]
    out = np.tanh(np.asarray(h)[:, :C]) * \
        (1 / (1 + np.exp(-np.asarray(h)[:, C:])))
    res = (np.asarray(x) + np.einsum("ck,bkl->bcl", wr, out)
           + np.asarray(br)[:, None]) * math.sqrt(0.5)
    skip = np.einsum("sk,bkl->bsl", ws, out) + np.asarray(bs)[:, None]
    res_r, skip_r = gate_res_skip_ref(h, x, wr, br, ws, bs)
    np.testing.assert_allclose(np.asarray(res_r), res, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(skip_r), skip, atol=1e-5,
                               rtol=1e-4)


def test_gate_kernel_bf16_fast():
    h, x, wr, br, ws, bs = _data(seed=2)
    res_k, skip_k = gate_res_skip(h.astype(jnp.bfloat16),
                                  x.astype(jnp.bfloat16),
                                  wr, br, ws, bs, fast=True)
    res_r, skip_r = gate_res_skip_ref(h, x, wr, br, ws, bs)
    assert res_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(res_k, np.float32),
                               np.asarray(res_r), atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(skip_k, np.float32),
                               np.asarray(skip_r), atol=0.05, rtol=0.05)
