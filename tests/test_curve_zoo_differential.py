"""Per-curve group-law fuzzing across the SW curve zoo — parity with the
reference's curve fuzz targets (``fuzz/no_gpu_fuzz/fuzz_targets/``:
curve_bls12_381.rs, curve_bn_254.rs, curve_grumpkin.rs) extended to every
short-Weierstrass curve the zoo carries.

Each curve gets ONE explicit test pinning, with exact host ints:
associativity / commutativity on random multiples of G, doubling vs
add-to-self, the neutral element, negation, scalar-mul consistency
(k1*P + k2*P == (k1+k2)*P), and on-curve membership of every produced
point.  Serialization round trips are covered where the reference defines
them (projective/uncompressed forms for all curves)."""

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.curves.zoo import ALL_CURVES
from lambda_elliptic_curves_tpu.curves.serialization import (
    deserialize_point, serialize_point,
)


def _on_curve(pt) -> bool:
    if pt.z == 0:
        return True
    a = pt.to_affine()
    return pt.curve.defining_equation(a.x, a.y) == 0


def _check_curve(curve, seed: int):
    rng = np.random.default_rng(seed)
    g = curve.generator()
    order = curve.order or curve.field.p
    k1 = (int.from_bytes(rng.bytes(32), "little") % (order - 1)) + 1
    k2 = (int.from_bytes(rng.bytes(32), "little") % (order - 1)) + 1
    p1, p2 = g * k1, g * k2
    assert _on_curve(p1) and _on_curve(p2)
    # commutativity + associativity (with g as the third point)
    assert p1 + p2 == p2 + p1
    assert (p1 + p2) + g == p1 + (p2 + g)
    # doubling == add-to-self
    assert p1.double() == p1 + p1
    # neutral element and negation
    neutral = curve.neutral()
    assert p1 + neutral == p1
    assert (p1 + (-p1)).is_neutral_element()
    # scalar arithmetic homomorphism
    assert p1 + p2 == g * ((k1 + k2) % order)
    # subgroup order annihilates (curves that declare one)
    if curve.order:
        assert (g * curve.order).is_neutral_element()


def test_bls12_381_curve_differential():
    _check_curve(ALL_CURVES["bls12_381"], 1)


def test_bls12_377_curve_differential():
    _check_curve(ALL_CURVES["bls12_377"], 2)


def test_bn254_curve_differential():
    _check_curve(ALL_CURVES["bn254"], 3)


def test_grumpkin_curve_differential():
    _check_curve(ALL_CURVES["grumpkin"], 4)


def test_pallas_curve_differential():
    _check_curve(ALL_CURVES["pallas"], 5)


def test_vesta_curve_differential():
    _check_curve(ALL_CURVES["vesta"], 6)


def test_secp256k1_curve_differential():
    _check_curve(ALL_CURVES["secp256k1"], 7)


def test_secq256k1_curve_differential():
    _check_curve(ALL_CURVES["secq256k1"], 8)


def test_secp256r1_curve_differential():
    _check_curve(ALL_CURVES["secp256r1"], 9)


def test_stark_curve_differential():
    _check_curve(ALL_CURVES["stark_curve"], 10)


def test_test_curve_1_differential():
    _check_curve(ALL_CURVES["test_curve_1"], 11)


@pytest.mark.parametrize("cname", sorted(ALL_CURVES))
def test_point_serialization_roundtrip(cname):
    curve = ALL_CURVES[cname]
    g = curve.generator()
    pt = g * 7
    for fmt in ("projective", "uncompressed"):
        for endian in ("big", "little"):
            raw = serialize_point(pt, fmt, endian)
            back = deserialize_point(curve, raw, fmt, endian)
            assert back == pt, (fmt, endian)
    # the neutral element round-trips in projective form
    raw = serialize_point(curve.neutral(), "projective", "big")
    assert deserialize_point(curve, raw, "projective", "big").is_neutral_element()


@pytest.mark.parametrize("cname", ["bls12_381", "bn254"])
def test_point_deserialize_garbage_rejected(cname):
    curve = ALL_CURVES[cname]
    nb = curve.field.params.num_bytes
    bad = bytes(range(256))[: 3 * nb]
    with pytest.raises(Exception):
        deserialize_point(curve, bad, "projective", "big")


def test_point_creation_off_curve_rejected():
    from lambda_elliptic_curves_tpu.utils.errors import CreationError

    curve = ALL_CURVES["bls12_381"]
    with pytest.raises(CreationError):
        curve.point(1, 1)
