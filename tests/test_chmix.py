"""Grad parity of the fused channel-mix training kernels (interpret mode)
vs jax.vjp of their XLA references."""

import numpy as np

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.ops import chmix


def _rel(a, b):
    return float(jnp.abs(a - b).max()) / max(float(jnp.abs(b).max()), 1e-9)


def test_ff_train_vjp_matches_autodiff():
    rng = np.random.RandomState(0)
    B, S, H, Rc = 2, 16, 16, 128
    F = 2 * H
    x = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * 0.3)
    skip = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32))
    m = jnp.asarray([0.1], np.float32)
    s = jnp.asarray([1.2], np.float32)
    w1 = jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)

    ref = jax.jit(lambda g, *a: jax.vjp(
        lambda *a: chmix.ln_ff_res_ref(*a), *a)[1](g))(
        g, x, m, s, w1, b1, w2, b2)
    mine = jax.jit(lambda g, *a: jax.vjp(
        lambda *a: chmix._ff_train(False, *a), *a)[1](g))(
        g, x, m, s, w1, b1, w2, b2)
    for name, a, b in zip("dx dm ds dw1 db1 dw2 db2".split(), mine, ref):
        assert _rel(a, b) < 2e-5, (name, _rel(a, b))

    # skip variant
    _, vjp = jax.vjp(
        lambda x_, sk, *a: chmix.ln_ff_res_ref(x_, *a, skip=sk),
        x, skip, m, s, w1, b1, w2, b2)
    ref = vjp(g)
    _, vjp2 = jax.vjp(lambda *a: chmix._ff_train_skip(False, *a),
                      x, skip, m, s, w1, b1, w2, b2)
    mine = vjp2(g)
    for name, a, b in zip("dx dskip dm ds dw1 db1 dw2 db2".split(),
                          mine, ref):
        assert _rel(a, b) < 2e-5, (name, _rel(a, b))


def test_glu_train_vjp_matches_autodiff():
    rng = np.random.RandomState(1)
    B, S, H, Rc = 2, 8, 16, 128
    y = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * 0.3)
    res = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(B, S, H, Rc).astype(np.float32))
    w = jnp.asarray(rng.randn(2 * H, H).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(2 * H).astype(np.float32) * 0.1)
    _, vjp = jax.vjp(lambda *a: chmix.glu_res_ref(*a), y, res, w, b)
    ref = vjp(g)
    _, vjp2 = jax.vjp(lambda *a: chmix._glu_train(False, *a), y, res, w, b)
    mine = vjp2(g)
    for name, a, b_ in zip("dy dres dw db".split(), mine, ref):
        assert _rel(a, b_) < 2e-5, (name, _rel(a, b_))
