"""Conditional (vocoder) training actually conditions.

Round-2 regression guard: ``make_train_step`` received the mel batch but
never threaded it into ``training_loss`` (the reference does at
train.py:134 ``training_loss(..., mel_spec=mel_spectrogram)``), so the
LJSpeech vocoder workload silently trained an unconditional model and the
mel-branch parameters (``mel_upsampler``/``mel_conv``) received zero
gradient forever.  These tests pin:

1. the runtime train step moves the mel parameters and its loss depends
   on the mel content;
2. mel-branch gradients are nonzero through ``training_loss``;
3. the fused compact train/eval paths (which add ``mel_conv(mel)`` into
   the S4 residual rather than post-S4 like the reference,
   models/sashimi.py:160-175 — algebraically equal) match the flat path
   that is parity-tested against the reference torch model.
"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from diffwave_sashimi_tpu.diffusion import diffusion_schedule, training_loss
from diffwave_sashimi_tpu.models.sashimi import Sashimi
from diffwave_sashimi_tpu.runtime.train import make_train_step


def _perturb(params, key, scale=0.02):
    """Random-perturb every parameter: the zero-init final conv otherwise
    blocks all gradient flow into the network body at init (CLAUDE.md
    fact 12), which is exactly how the dropped-mel bug evaded the round-2
    tests."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten(
        [l + scale * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)])


def _mel_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    sel = [(jax.tree_util.keystr(p), v) for p, v in flat
           if "mel_conv" in jax.tree_util.keystr(p)
           or "mel_upsampler" in jax.tree_util.keystr(p)]
    assert sel, "conditional model has no mel parameters?"
    return sel


@pytest.fixture(scope="module")
def tiny_cond():
    L, hop = 1024, 16
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                    L=L, unconditional=False, mel_upsample=(4, 4))
    frames = L // hop
    mel = jax.random.normal(jax.random.PRNGKey(3), (2, 80, frames),
                            jnp.float32)
    audio = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (2, 1, L),
                                    jnp.float32)
    # jitted: eager whole-model init is per-op-dispatch-bound on this
    # 1-core box, and the compiled program persists in .jax_cache
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio[:1],
                                 jnp.zeros((1,), jnp.int32), mel[:1])
    params = _perturb(params, jax.random.PRNGKey(1))
    return model, params, audio, mel


def test_train_step_updates_mel_params_and_uses_mel(tiny_cond):
    """The actual runtime step (make_train_step): one Adam step must move
    the mel-branch params, and the loss must change when the mel does."""
    model, params, audio, mel = tiny_cond
    schedule = diffusion_schedule(T=4, beta_0=1e-4, beta_T=0.05)
    optimizer = optax.adam(2e-4)
    step = make_train_step(model, optimizer, schedule)
    rng = jax.random.PRNGKey(7)

    p0_mel = dict(_mel_paths(params))
    p1, _, loss1 = step(jax.tree.map(jnp.copy, params),
                        optimizer.init(params), audio, mel, rng)
    for path, v in _mel_paths(p1):
        delta = float(jnp.abs(v - p0_mel[path]).max())
        assert delta > 0.0, f"mel param {path} did not move"

    # same params/rng (=> same t, z draws), different mel content
    _, _, loss2 = step(jax.tree.map(jnp.copy, params),
                       optimizer.init(params), audio,
                       jnp.roll(mel, 7, axis=-1), rng)
    assert abs(float(loss1) - float(loss2)) > 1e-8, \
        "loss is insensitive to the mel conditioning"


def test_hoisted_mel_conds_match_per_step_mel(tiny_cond):
    """The hoisted conditioning (compute_mel_conds + mel_conds threading —
    the path ALL conditional sampling routes through, runtime/generate.py)
    must equal the per-step mel_spec path.  A stage-name or block-order
    slip in the stacked (n_layers, ...) conds would pass every other test
    while mis-conditioning all production sampling."""
    model, params, audio, mel = tiny_cond
    L = audio.shape[-1]
    t = jnp.zeros((audio.shape[0],), jnp.int32)

    y_ref = jax.jit(model.apply)(params, audio, t, mel)
    conds_flat = jax.jit(lambda p, m: model.apply(
        p, m, L, False, method=Sashimi.compute_mel_conds))(params, mel)
    y_hoist = jax.jit(lambda p, a, t, c: model.apply(
        p, a, t, None, mel_conds=c))(params, audio, t, conds_flat)
    np.testing.assert_allclose(np.asarray(y_hoist), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_bf16_conditional_train_step_runs():
    """Regression: with bf16 model dtype, the mel upsampler's transpose
    conv used preferred_element_type=f32, whose VJP builds a conv of the
    f32 cotangent against the bf16 weight — lax rejects mixed dtypes, so
    every bf16 conditional TRAIN step crashed (forward-only paths hid
    it).  One value_and_grad step must run and produce finite grads."""
    L = 1024
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                    L=L, unconditional=False, mel_upsample=(4, 4),
                    dtype=jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(3), (2, 80, L // 16))
    audio = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (2, 1, L))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio[:1],
                                 jnp.zeros((1,), jnp.int32), mel[:1])
    schedule = diffusion_schedule(T=4, beta_0=1e-4, beta_T=0.05)

    def apply_fn(p, x, t, m=None, **kw):
        return model.apply(p, x, t, m, train=True, **kw)

    loss, grads = jax.jit(jax.value_and_grad(
        lambda p: training_loss(apply_fn, p, audio, schedule,
                                jax.random.PRNGKey(11),
                                mel_spec=mel)))(params)
    assert np.isfinite(float(loss))
    for path, g in _mel_paths(grads):
        assert np.isfinite(np.asarray(g, np.float32)).all(), path


def test_mel_branch_gradients_nonzero(tiny_cond):
    model, params, audio, mel = tiny_cond
    schedule = diffusion_schedule(T=4, beta_0=1e-4, beta_T=0.05)

    def apply_fn(p, x, t, m=None, **kw):
        return model.apply(p, x, t, m, train=True, **kw)

    def loss_fn(p):
        return training_loss(apply_fn, p, audio, schedule,
                             jax.random.PRNGKey(11), mel_spec=mel)

    grads = jax.jit(jax.grad(loss_fn))(params)
    for path, g in _mel_paths(grads):
        assert float(jnp.abs(g).max()) > 0.0, f"zero grad on {path}"

    # and the forward output itself depends on mel
    t = jnp.zeros((audio.shape[0],), jnp.int32)
    y1 = jax.jit(model.apply)(params, audio, t, mel)
    y2 = jax.jit(model.apply)(params, audio, t, jnp.roll(mel, 7, axis=-1))
    assert float(jnp.abs(y1 - y2).max()) > 1e-7


@pytest.fixture(scope="module")
def compact_cond():
    # smallest layout-compatible conditional config (see
    # test_sashimi_compact): L=16000, mel hop 16*16=256 -> 63 frames
    L = 16000
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                    L=L, unconditional=False, mel_upsample=(16, 16))
    frames = L // 256 + 1
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 80, frames),
                            jnp.float32)
    audio = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (1, 1, L),
                                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio,
                                 jnp.zeros((1,), jnp.int32), mel)
    params = _perturb(params, jax.random.PRNGKey(1))
    return model, params, audio, mel


def _jit_kernels_v2(model, params):
    return jax.jit(lambda p: model.apply(
        p, 16000, "v2", method=Sashimi.compute_kernels))(params)


def test_compact_eval_conditional_matches_flat(compact_cond):
    model, params, audio, mel = compact_cond
    steps = jnp.asarray([42], jnp.int32)
    y_flat = jax.jit(model.apply)(params, audio, steps, mel)
    kernels = _jit_kernels_v2(model, params)
    y_v2 = jax.jit(lambda p, a, s, m, k: model.apply(
        p, a, s, m, kernels=k))(params, audio, steps, mel, kernels)
    assert float(jnp.abs(y_flat - jnp.roll(y_flat, 1, -1)).max()) > 0
    np.testing.assert_allclose(np.asarray(y_v2), np.asarray(y_flat),
                               atol=3e-4, rtol=1e-3)


def test_hoisted_mel_conds_match_per_step_compact(compact_cond):
    """Hoisted conds on the compact (TPU fast) layout: kernels + stacked
    compact conds must reproduce the per-step mel path."""
    model, params, audio, mel = compact_cond
    t = jnp.asarray([42], jnp.int32)
    kernels = _jit_kernels_v2(model, params)
    y_ref = jax.jit(model.apply)(params, audio, t, mel, kernels)
    conds = jax.jit(lambda p, m: model.apply(
        p, m, 16000, True, method=Sashimi.compute_mel_conds))(params, mel)
    y_hoist = jax.jit(lambda p, a, t, k, c: model.apply(
        p, a, t, None, k, mel_conds=c))(params, audio, t, kernels, conds)
    assert float(jnp.abs(y_ref - jnp.roll(y_ref, 1, -1)).max()) > 0
    np.testing.assert_allclose(np.asarray(y_hoist), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_compact_train_conditional_grads_match_flat(compact_cond):
    """The fused TRAIN path's residual-side mel add (res = x + mel_conv(mel)
    into the S4 custom-VJP conv) equals the reference's post-S4 add — in
    value AND in gradients, including the mel branch."""
    model, params, audio, mel = compact_cond
    steps = jnp.asarray([42], jnp.int32)

    def loss_v2(p):
        k = model.apply(p, 16000, "v2", method=Sashimi.compute_kernels)
        y = model.apply(p, audio, steps, mel, kernels=k, train=True)
        return jnp.mean(y ** 2)

    def loss_flat(p):
        y = model.apply(p, audio, steps, mel, train=True)
        return jnp.mean(y ** 2)

    g_v2 = jax.jit(jax.grad(loss_v2))(params)
    g_flat = jax.jit(jax.grad(loss_flat))(params)

    # mel branch specifically is nonzero and matches
    mv2, mfl = dict(_mel_paths(g_v2)), dict(_mel_paths(g_flat))
    for path in mfl:
        assert float(jnp.abs(mfl[path]).max()) > 0.0, path
        np.testing.assert_allclose(np.asarray(mv2[path]),
                                   np.asarray(mfl[path]),
                                   atol=5e-5, rtol=5e-3, err_msg=path)

    flat_v2, _ = jax.flatten_util.ravel_pytree(g_v2)
    flat_fl, _ = jax.flatten_util.ravel_pytree(g_flat)
    np.testing.assert_allclose(np.asarray(flat_v2), np.asarray(flat_fl),
                               atol=5e-5, rtol=5e-3)
