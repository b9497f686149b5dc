"""Per-curve structural tests across the zoo (parity role: the
reference's per-curve ``#[cfg(test)]`` blocks in
``math/src/elliptic_curve/short_weierstrass/curves/**`` — generator
on-curve, generator order, group laws, scalar-mul identities)."""

import pytest

from lambda_elliptic_curves_tpu.curves import zoo as CZ

NAMED = [
    CZ.BLS12381Curve, CZ.BLS12377Curve, CZ.BN254Curve, CZ.GrumpkinCurve,
    CZ.PallasCurve, CZ.VestaCurve, CZ.Secp256k1Curve, CZ.Secq256k1Curve,
    CZ.Secp256r1Curve, CZ.StarkCurve,
]
IDS = [c.name for c in NAMED]


@pytest.mark.parametrize("curve", NAMED, ids=IDS)
def test_generator_on_curve(curve):
    assert curve.defining_equation(curve.gx, curve.gy) == 0


@pytest.mark.parametrize("curve", NAMED, ids=IDS)
def test_generator_has_subgroup_order(curve):
    g = curve.generator()
    assert not g.is_neutral_element()
    assert g.operate_with_self(curve.order).is_neutral_element()
    # order is prime: no smaller power of 2/3 hits neutral
    assert not g.operate_with_self(2).is_neutral_element()


@pytest.mark.parametrize("curve", NAMED, ids=IDS)
def test_group_laws(curve):
    g = curve.generator()
    g2 = g + g
    g3 = g2 + g
    assert g3 == g + g2
    assert g * 3 == g3
    assert (g3 + g3.neg()).is_neutral_element()
    assert g + curve.neutral() == g
    # scalar distributivity: (a+b)G = aG + bG
    assert g * 7 == g * 3 + g * 4
    # mixed doubling path: 2(3G) == 3(2G)
    assert g3 * 2 == g2 * 3


@pytest.mark.parametrize("curve", NAMED, ids=IDS)
def test_scalar_mul_mod_order(curve):
    g = curve.generator()
    assert g * (curve.order + 5) == g * 5


def test_all_curves_registry_complete():
    assert len(CZ.ALL_CURVES) >= 11
    for name, curve in CZ.ALL_CURVES.items():
        assert curve.defining_equation(curve.gx, curve.gy) == 0, name


def test_point_creation_rejects_off_curve():
    from lambda_elliptic_curves_tpu.utils.errors import CreationError

    with pytest.raises(CreationError):
        CZ.BLS12381Curve.point(5, 7)


def test_edwards_and_montgomery_models():
    from lambda_elliptic_curves_tpu.curves.edwards import (
        BandersnatchCurve, Ed448Goldilocks, TinyJubJubEdwards,
    )
    from lambda_elliptic_curves_tpu.curves.montgomery import (
        TinyJubJubMontgomery,
    )

    for curve in (BandersnatchCurve, Ed448Goldilocks, TinyJubJubEdwards,
                  TinyJubJubMontgomery):
        g = curve.generator()
        assert curve.defining_equation(int(g.x), int(g.y)) == 0
        g2 = g.operate_with(g)
        g3 = g2.operate_with(g)
        assert g3 == g.operate_with(g2)
        assert g.operate_with_self(3) == g3
