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
