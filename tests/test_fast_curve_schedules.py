"""Pin the fast-schedule construction helpers behind the measured
speed-quality curve (BASELINE.md round-5): ``canon_beta`` in bench.py and
``beta_list`` in scripts/fast_curve.py.  The canon-shaped T=12 schedule is
the framework's quality-parity >=20x operating point (measured FID 1.24 vs
the exact path's 1.31 on the d128 flagship), so its construction must stay
exactly reproducible."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import FAST_BETA_6, canon_beta  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from fast_curve import beta_list  # noqa: E402


def test_canonical_list_is_identity_at_t6():
    assert beta_list(6) == FAST_BETA_6
    assert beta_list(6, "canon") == FAST_BETA_6
    np.testing.assert_allclose(canon_beta(6), FAST_BETA_6, rtol=1e-12)


def test_package_is_single_source():
    from diffwave_sashimi_tpu.diffusion import (FAST_BETA_6 as PKG6,
                                                fast_beta_list)
    assert list(PKG6) == FAST_BETA_6
    for T, shape in ((12, "canon"), (8, "geom")):
        assert fast_beta_list(T, shape) == beta_list(T, shape)
    assert fast_beta_list(12, "canon") == canon_beta(12)
    import pytest
    with pytest.raises(ValueError):
        fast_beta_list(12, "nope")


def test_schedule_from_cfg_fast_steps():
    """`+diffusion.fast_steps=12` synthesizes the canon schedule; an
    explicit beta list still wins; fast=False ignores it."""
    from diffwave_sashimi_tpu.diffusion import (fast_beta_list,
                                                schedule_from_cfg)
    base = {"T": 200, "beta_0": 1e-4, "beta_T": 0.02, "beta": None}
    s = schedule_from_cfg({**base, "fast_steps": 12}, fast=True)
    assert s.T == 12
    np.testing.assert_allclose(np.asarray(s.beta),
                               fast_beta_list(12, "canon"), rtol=1e-6)
    assert s.t_embed is not None and s.t_embed.shape == (12,)
    s_geom = schedule_from_cfg({**base, "fast_steps": 12,
                                "fast_shape": "geom"}, fast=True)
    np.testing.assert_allclose(np.asarray(s_geom.beta),
                               fast_beta_list(12, "geom"), rtol=1e-6)
    # explicit beta list takes precedence over fast_steps
    s_beta = schedule_from_cfg({**base, "beta": FAST_BETA_6,
                                "fast_steps": 12}, fast=True)
    assert s_beta.T == 6
    # not a fast build: the full linear schedule, fast_steps ignored
    s_full = schedule_from_cfg({**base, "fast_steps": 12}, fast=False)
    assert s_full.T == 200 and s_full.t_embed is None


def test_canon_shape_properties():
    for T in (4, 8, 12, 16):
        b = canon_beta(T)
        assert len(b) == T
        # endpoints pinned to the canonical list's
        assert abs(b[0] - FAST_BETA_6[0]) < 1e-12
        assert abs(b[-1] - FAST_BETA_6[-1]) < 1e-12
        # strictly increasing (a variance schedule)
        assert all(x < y for x, y in zip(b, b[1:]))
        # log-linear in index space: every point lies on (or between)
        # the canonical polyline's segments, so log-betas are bounded by
        # the canonical envelope and within each segment's chord
        assert all(np.log(FAST_BETA_6[0]) - 1e-12 <= np.log(v)
                   <= np.log(FAST_BETA_6[-1]) + 1e-12 for v in b)


def test_geom_matches_numpy_geomspace():
    b = beta_list(12, "geom")
    np.testing.assert_allclose(
        b, np.geomspace(FAST_BETA_6[0], FAST_BETA_6[-1], 12), rtol=1e-12)


def test_canon_t12_golden():
    """The exact schedule behind the committed FID-1.24 point
    (eval_assets/fast_curve_d128.json, T=12 canon)."""
    got = canon_beta(12)
    want = [0.0001, 0.0002848, 0.00081113, 0.00231013, 0.00657933,
            0.01551059, 0.03223605, 0.06433324, 0.12080894, 0.21737338,
            0.32967665, 0.5]
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert beta_list(12, "canon") == got
