"""Elliptic curve group law + MSM tests (device vs exact host oracle).

Mirrors the reference's per-curve tests (adding/doubling/order checks in
``curves/*/curve.rs`` test mods) and the MSM proptests
(``msm/pippenger.rs:221``).
"""

import random

import pytest

from lambda_elliptic_curves_tpu.curves import (
    BLS12381Curve, BN254Curve, Secp256k1Curve, StarkCurve, TestCurve1,
    JacobianOps, msm, msm_naive_host,
)
from lambda_elliptic_curves_tpu.curves.msm import (
    msm_double_and_add, msm_pippenger, scalars_to_digits,
)

CURVES = [BLS12381Curve, BN254Curve, Secp256k1Curve, StarkCurve]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_host_group_law(curve):
    g = curve.generator()
    assert curve.defining_equation(g.gx if False else curve.gx, curve.gy) == 0
    g2 = g.double()
    assert g2 == g + g
    g3 = g2 + g
    assert g3 == g * 3
    assert (g + (-g)).is_neutral_element()
    assert (g + curve.neutral()) == g
    if curve.order:
        assert (g * curve.order).is_neutral_element()
        assert g * (curve.order + 5) == g * 5


@pytest.mark.parametrize("curve", [BN254Curve, TestCurve1], ids=lambda c: c.name)
def test_device_group_law_matches_host(curve):
    ops = JacobianOps(curve)
    g = curve.generator()
    pts = [g * k for k in (1, 2, 3, 7)] + [curve.neutral()]
    dev = ops.from_host(pts)
    # doubling
    doubled = ops.to_host(ops.double(dev))
    for p_in, p_out in zip(pts, doubled):
        assert p_out == p_in.double()
    # pairwise adds, including identity and doubling cases
    others = [g * k for k in (5, 2, 11, 0, 3)]
    others = [o if k != 0 else curve.neutral()
              for o, k in zip(others, (5, 2, 11, 0, 3))]
    dev2 = ops.from_host(others)
    summed = ops.to_host(ops.add(dev, dev2))
    for a, b, s in zip(pts, others, summed):
        assert s == a + b
    # inverse pair -> infinity
    inv = ops.from_host([(-p) if not p.is_neutral_element() else p
                         for p in pts])
    cancelled = ops.to_host(ops.add(dev, inv))
    for p, c in zip(pts, cancelled):
        assert c.is_neutral_element() or p.is_neutral_element()


@pytest.mark.parametrize("curve", [BN254Curve, TestCurve1], ids=lambda c: c.name)
def test_device_mixed_add_matches_host(curve):
    """add_mixed(jacobian, affine) == host add, incl. every edge case the
    complete formula must handle (identity either side, doubling lane,
    inverse pair)."""
    ops = JacobianOps(curve)
    g = curve.generator()
    lhs_host = [g * 2, g * 4, g, g * 6, curve.neutral(), g * 5]
    rhs_host = [g * 5, curve.neutral(), g, (-(g * 6)), g * 3, g * 5]
    # double() of an affine upload yields z != 1 lanes: a genuinely
    # Jacobian left operand (half of lhs_host pre-halved so values match)
    lhs_dev = ops.double(ops.from_host([g, g * 2, g * 7, g * 3,
                                        curve.neutral(), g * 9]))
    # lanes 2 and 5 must be exactly affine to hit doubling/equal cases
    aff = ops.from_host([g, g * 2, g, g * 3, curve.neutral(), g * 5])
    import jax.numpy as jnp
    lane = jnp.arange(6)
    pick_aff = (lane == 2) | (lane == 5)
    lhs_dev = ops.select(pick_aff, aff, lhs_dev)
    lhs_host = [g * 2, g * 4, g, g * 6, curve.neutral(), g * 5]
    rhs_dev = ops.from_host(rhs_host)
    got = ops.to_host(ops.add_mixed(lhs_dev, rhs_dev))
    for a, b, s in zip(lhs_host, rhs_host, got):
        assert s == a + b


def test_tree_reduce():
    curve = BN254Curve
    ops = JacobianOps(curve)
    g = curve.generator()
    pts = [g * k for k in (1, 2, 3, 4, 5)]
    dev = ops.from_host(pts)
    total = ops.to_host(ops.tree_reduce(dev))[0]
    assert total == g * 15


@pytest.mark.parametrize("method", ["naive", "pippenger"])
def test_msm_matches_host_oracle(method, monkeypatch):
    monkeypatch.setenv("LWT_MSM_HOST_MAX", "0")  # force the device path
    curve = BN254Curve
    rng = random.Random(11)
    g = curve.generator()
    n = 9
    points = [g * rng.randrange(1, 1000) for _ in range(n)]
    scalars = [rng.randrange(curve.order) for _ in range(n)]
    scalars[3] = 0  # zero scalar
    expected = msm_naive_host(scalars, points)
    got = msm(curve, scalars, points, method=method)
    assert got == expected


def test_msm_two_level_window_reduce(monkeypatch):
    """The two-level bucket reduction (the TPU fast path for big windows)
    against the host oracle, forced on at a compact-core width the CPU
    rig can compile."""
    monkeypatch.setenv("LWT_MSM_HOST_MAX", "0")
    monkeypatch.setenv("LWT_MSM_REDUCE", "two_level")
    curve = TestCurve1
    g = curve.generator()
    rng = random.Random(3)
    n = 24
    points = [g * rng.randrange(1, 50) for _ in range(n)]
    scalars = [rng.randrange(curve.order or 1 << 16) for _ in range(n)]
    expected = msm_naive_host(scalars, points)
    # window sizes straddle the R/C2 split parities, incl. odd c
    for c in (4, 5, 7):
        got = msm(curve, scalars, points, window_size=c)
        assert got == expected, c


def test_msm_pippenger_window_sizes():
    curve = TestCurve1  # tiny field -> fast
    g = curve.generator()
    points = [g * k for k in (1, 2, 3, 4)]
    scalars = [3, 1, 4, 2]
    expected = msm_naive_host(scalars, points)
    for c in (1, 2, 3):
        got = msm(curve, scalars, points, window_size=c)
        assert got == expected
