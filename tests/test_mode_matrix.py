"""Mode-matrix sweep: FFT precision x kernel layout x param layout.

The precision/layout surface (ops/mxu_fft tri-state fast mode,
compute_kernels' {True, "fact", "v2"} families, block_scan vs unrolled
params) grew past what the individual tests cover pairwise; this sweep
pins every feasible combination against ONE baseline (strict, block_scan,
no precomputed kernels) on a common perturbed-parameter forward so the
matrix cannot silently fork numerics.

Infeasible by design (skipped): unrolled x "v2" — the channel-inner
compact layout exists only for the whole-forward block_scan path
(models/sashimi.py:681).

Params are PERTURBED from init: the zero-init final conv makes every
output exactly zero at init (CLAUDE.md fact 12), so an init-params sweep
would vacuously pass.

Tolerances (max|y - y0| / max|y0|), documented next to the modes they
test (ops/mxu_fft.py module docstring):
  strict  1e-4   same math, different op order (fused-kernel fallbacks)
  high    2e-3   bf16x3 construction FFTs, kernel rel err ~1e-6, but the
                 error enters pre-GLU activations and compounds
  fast    5e-2   bf16 1-pass construction FFTs, kernel rel err ~2e-3
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffwave_sashimi_tpu.models.sashimi import Sashimi
from diffwave_sashimi_tpu.utils.torch_compat import stack_sashimi_blocks

pytestmark = pytest.mark.slow  # 11 combos x (construct + fwd) at L=16000

L = 16000  # smallest v2-compatible length at pool=(4,4) (deepest tier 1000)
TOL = {"strict": 1e-4, "high": 2e-3, "fast": 5e-2}


@pytest.fixture(scope="module")
def matrix_base():
    un = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=L, block_scan=False)
    params = jax.jit(un.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)),
                              jnp.zeros((1,), jnp.int32))
    # perturb every leaf (incl. the zero-init head) so the output is
    # non-trivial; small scale keeps the S4 state matrices in a sane regime
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    leaves = [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, keys)]
    params_un = jax.tree.unflatten(treedef, leaves)
    params_sc = {"params": stack_sashimi_blocks(
        jax.tree.map(np.asarray, params_un["params"]), 1, [4, 4])}

    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 1, L)) * 0.3
    steps = jnp.array([7])
    sc = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=L, block_scan=True)
    y0 = np.asarray(sc.apply(params_sc, audio, steps))
    assert np.max(np.abs(y0)) > 1e-3, "baseline output still ~zero"
    return params_un, params_sc, audio, steps, y0


@pytest.mark.parametrize("fft", ["strict", "high", "fast"])
@pytest.mark.parametrize("kmode", [True, "fact", "v2"])
@pytest.mark.parametrize("layout", ["scan", "unrolled"])
def test_mode_matrix_agrees(matrix_base, monkeypatch, layout, kmode, fft):
    """Each combo runs kernel construction through the TPU code path
    (``_on_tpu`` patched True so the MXU four-step FFT executes instead of
    the CPU ``jnp.fft`` fallback) against the jnp.fft baseline.  On CPU
    the HIGH/HIGHEST precision enums are identical f32 matmuls, so
    strict == high here; "fast" casts operands to bf16, which is real
    rounding on any backend — the precision axis is exercised end to end,
    the TPU-only 3-pass-vs-6-pass distinction is covered on-chip by
    scripts/kern_ablation.py."""
    if layout == "unrolled" and kmode == "v2":
        pytest.skip("compact v2 layout requires block_scan "
                    "(models/sashimi.py:681)")
    if layout == "unrolled" and fft != "strict":
        pytest.skip("precision sweep runs on the scan layout; the layouts "
                    "share the construction code (test_sashimi_parity "
                    "pins scan==unrolled at strict)")
    params_un, params_sc, audio, steps, y0 = matrix_base
    from diffwave_sashimi_tpu.models import s4
    monkeypatch.setattr(s4, "_on_tpu", lambda: True)
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), L=L,
                    block_scan=(layout == "scan"), kernel_fft_fast=fft)
    p = params_sc if layout == "scan" else params_un
    k = model.apply(p, L, kmode, method=Sashimi.compute_kernels)
    y = np.asarray(model.apply(p, audio, steps, kernels=k))
    rel = np.max(np.abs(y - y0)) / np.max(np.abs(y0))
    assert rel < TOL[fft], (layout, kmode, fft, rel)
