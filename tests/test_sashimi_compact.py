"""End-to-end correctness of the channel-inner compact-layout fast path:
Sashimi forward with "v2" kernels must match the standard flat-layout
forward (which is itself parity-tested against the reference torch model
in test_sashimi_parity.py)."""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from diffwave_sashimi_tpu.models.sashimi import Sashimi


@pytest.fixture(scope="module")
def model_and_params(sashimi_small):
    # shared session fixture: ONE jitted block-scan init compile for the
    # whole suite (a second standalone copy segfaults XLA:CPU late in the
    # run — see conftest.sashimi_small)
    return sashimi_small


def test_v2_compatible_gate(model_and_params):
    model, _ = model_and_params
    assert model.v2_compatible(16000)
    assert not model.v2_compatible(8000)     # != trained length
    small = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=4096)
    assert not small.v2_compatible(4096)     # deepest tier too short
    # non-power-of-2 pool: p divides L but the pooled tier's native FFT
    # size is n_parent/8, not n_parent/5 — DownPool's compact sublane
    # split would mismatch the child layout; must take the flat path
    p5 = Sashimi(d_model=8, n_layers=1, pool=(5,), L=40000)
    assert not p5.v2_compatible(40000)


def test_compact_forward_matches_flat(model_and_params):
    model, params = model_and_params
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 1, 16000).astype(np.float32) * 0.3
    steps = np.array([7, 100], np.int32)

    y_flat = jax.jit(model.apply)(params, jnp.asarray(audio),
                                  jnp.asarray(steps))
    kernels = jax.jit(lambda p: model.apply(
        p, 16000, "v2", method=Sashimi.compute_kernels))(params)
    for v in kernels.values():
        assert isinstance(v, tuple) and len(v) == 2
    y_v2 = jax.jit(lambda p, a, s, k: model.apply(p, a, s, kernels=k))(
        params, jnp.asarray(audio), jnp.asarray(steps), kernels)
    np.testing.assert_allclose(np.asarray(y_v2), np.asarray(y_flat),
                               atol=2e-4, rtol=1e-3)


def test_compact_forward_train_grads(model_and_params):
    """The differentiable (train=True) compact path: grads vs the flat
    path through the same loss."""
    model, params = model_and_params
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32) * 0.3)
    steps = jnp.asarray(np.array([42], np.int32))

    def loss_v2(p):
        k = model.apply(p, 16000, "v2", method=Sashimi.compute_kernels)
        y = model.apply(p, audio, steps, kernels=k, train=True)
        return jnp.mean(y ** 2)

    def loss_flat(p):
        y = model.apply(p, audio, steps, train=True)
        return jnp.mean(y ** 2)

    g_v2 = jax.jit(jax.grad(loss_v2))(params)
    g_flat = jax.jit(jax.grad(loss_flat))(params)
    flat_v2, _ = jax.flatten_util.ravel_pytree(g_v2)
    flat_fl, _ = jax.flatten_util.ravel_pytree(g_flat)
    np.testing.assert_allclose(np.asarray(flat_v2), np.asarray(flat_fl),
                               atol=5e-5, rtol=5e-3)

@pytest.mark.parametrize("block_scan", [True, False])
def test_remat_train_grads(block_scan):
    """remat=True must keep `train` static under jax.checkpoint
    (static_argnums on the nn.remat wrappers): the TPU training path runs
    remat + v2/fact kernels + train=True, which CPU tests otherwise never
    exercise because the auto-kernel gate is backend-conditional."""
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                    L=16000, remat=True, block_scan=block_scan)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, 16000), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    audio = jnp.ones((1, 1, 16000), jnp.float32) * 0.1
    steps = jnp.asarray(np.array([3], np.int32))

    def loss_for(m):
        def loss(p):
            if block_scan:
                k = m.apply(p, 16000, "v2", method=Sashimi.compute_kernels)
            else:
                k = None
            y = m.apply(p, audio, steps, kernels=k, train=True)
            return jnp.mean(y ** 2)
        return loss

    g = jax.jit(jax.grad(loss_for(model)))(params)
    total = jax.flatten_util.ravel_pytree(g)[0]
    assert np.isfinite(np.asarray(total)).all()

    # the save_only_these_names("conv_out", "glu_out") policy must only
    # change WHAT is rematerialized, never the math: grads must equal the
    # no-remat model's exactly (same params tree layout, remat is a
    # transform not a parameterization change)
    model_nr = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                       L=16000, remat=False, block_scan=block_scan)
    g_nr = jax.jit(jax.grad(loss_for(model_nr)))(params)
    flat_r = jax.flatten_util.ravel_pytree(g)[0]
    flat_nr = jax.flatten_util.ravel_pytree(g_nr)[0]
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_nr),
                               atol=1e-6, rtol=1e-5)
