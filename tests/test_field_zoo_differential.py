"""Per-field differential fuzzing across the WHOLE zoo — parity with the
reference's per-field fuzz targets (``fuzz/no_gpu_fuzz/fuzz_targets/``:
field_fuzzer for stark252/babybear/mersenne31/mini_goldilocks/secp256k1,
plus from_hex/from_raw) extended to every field the zoo carries.

Each field gets ONE explicit test driving a fixed (8,)-batch through
add/sub/neg/mul/square/inv/pow and the Montgomery round trip against
exact Python-int arithmetic; values come from a per-field seeded rng
(dense coverage of the value space is the hypothesis suites' job —
this file pins every field's digit pipeline, including the wide 384/448-
bit ones no other suite touches)."""

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.fields.zoo import ALL_FIELDS


def _check_field(field, seed: int):
    rng = np.random.default_rng(seed)
    p = field.p
    B = 8
    xs = [int.from_bytes(rng.bytes(64), "little") % p for _ in range(B)]
    ys = [(int.from_bytes(rng.bytes(64), "little") % (p - 1)) + 1
          for _ in range(B)]
    a, b = field.array(xs), field.array(ys)
    assert [int(v) for v in field.to_ints(a)] == xs  # Montgomery roundtrip
    assert ([int(v) for v in field.to_ints(field.add(a, b))]
            == [(x + y) % p for x, y in zip(xs, ys)])
    assert ([int(v) for v in field.to_ints(field.sub(a, b))]
            == [(x - y) % p for x, y in zip(xs, ys)])
    assert ([int(v) for v in field.to_ints(field.neg(a))]
            == [(-x) % p for x in xs])
    assert ([int(v) for v in field.to_ints(field.mul(a, b))]
            == [x * y % p for x, y in zip(xs, ys)])
    assert ([int(v) for v in field.to_ints(field.square(a))]
            == [x * x % p for x in xs])
    assert ([int(v) for v in field.to_ints(field.inv(b))]
            == [pow(y, -1, p) for y in ys])
    e = 65537 % (p - 1) or 1
    assert ([int(v) for v in field.to_ints(field.pow(a, e))]
            == [pow(x, e, p) for x in xs])
    # batch inversion (Montgomery trick) incl. a zero slot
    zs = list(xs)
    zs[3] = 0
    za = field.array(zs)
    got = [int(v) for v in field.to_ints(field.batch_inverse(za))]
    want = [pow(z, -1, p) if z else 0 for z in zs]
    assert got == want


def test_stark252_differential():
    _check_field(ALL_FIELDS["stark252"], 1)


def test_stark101_differential():
    _check_field(ALL_FIELDS["stark101"], 2)


def test_babybear_differential():
    _check_field(ALL_FIELDS["babybear"], 3)


def test_babybear_full_differential():
    _check_field(ALL_FIELDS["babybear_full"], 4)


def test_goldilocks_differential():
    _check_field(ALL_FIELDS["goldilocks"], 5)


def test_mersenne31_differential():
    _check_field(ALL_FIELDS["mersenne31"], 6)


def test_bls12_381_base_differential():
    _check_field(ALL_FIELDS["bls12_381_base"], 7)


def test_bls12_381_scalar_differential():
    _check_field(ALL_FIELDS["bls12_381_scalar"], 8)


def test_bls12_377_base_differential():
    _check_field(ALL_FIELDS["bls12_377_base"], 9)


def test_bls12_377_scalar_differential():
    _check_field(ALL_FIELDS["bls12_377_scalar"], 10)


def test_bn254_base_differential():
    _check_field(ALL_FIELDS["bn254_base"], 11)


def test_bn254_scalar_differential():
    _check_field(ALL_FIELDS["bn254_scalar"], 12)


def test_pallas_differential():
    _check_field(ALL_FIELDS["pallas_base"], 13)


def test_vesta_differential():
    _check_field(ALL_FIELDS["vesta_base"], 14)


def test_secp256k1_base_differential():
    _check_field(ALL_FIELDS["secp256k1_base"], 15)


def test_secp256k1_scalar_differential():
    _check_field(ALL_FIELDS["secp256k1_scalar"], 16)


def test_secp256r1_base_differential():
    _check_field(ALL_FIELDS["secp256r1_base"], 17)


def test_secp256r1_scalar_differential():
    _check_field(ALL_FIELDS["secp256r1_scalar"], 18)


def test_stark_curve_scalar_differential():
    _check_field(ALL_FIELDS["stark_curve_scalar"], 19)


def test_p448_goldilocks_differential():
    _check_field(ALL_FIELDS["p448_goldilocks"], 20)


def test_u64_test_field_differential():
    _check_field(ALL_FIELDS["u64_test"], 21)


def test_f17_differential():
    _check_field(ALL_FIELDS["f17"], 22)


def test_f13_differential():
    _check_field(ALL_FIELDS["f13"], 23)


# ---------------------------------------------------------------------------
# sqrt / legendre across every field with an odd prime (reference:
# IsPrimeField::sqrt + legendre_symbol, math/src/field/traits.rs:234,245)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", sorted(ALL_FIELDS))
def test_sqrt_roundtrip(name):
    field = ALL_FIELDS[name]
    p = field.p
    if p == 2:
        pytest.skip("no odd sqrt")
    rng = np.random.default_rng(hash(name) % 2**32)
    x = int.from_bytes(rng.bytes(64), "little") % p
    sq = x * x % p
    fe = field(sq)
    roots = fe.sqrt()
    if roots is None:
        assert sq != 0 and pow(sq, (p - 1) // 2, p) != 1
    else:
        r1, r2 = roots
        assert (r1.value * r1.value) % p == sq
        assert (r2.value * r2.value) % p == sq
        assert (r1 + r2).value == 0 or p == 2


@pytest.mark.parametrize("name", sorted(ALL_FIELDS))
def test_legendre_symbol(name):
    field = ALL_FIELDS[name]
    p = field.p
    if p <= 3:
        pytest.skip("degenerate")
    rng = np.random.default_rng((hash(name) + 1) % 2**32)
    x = (int.from_bytes(rng.bytes(64), "little") % (p - 1)) + 1
    got = field.params.legendre(x)
    want = pow(x, (p - 1) // 2, p)
    want = -1 if want == p - 1 else want
    assert got == want


# ---------------------------------------------------------------------------
# from_hex / byte-serialization robustness (fuzz targets from_hex.rs,
# from_raw.rs; ByteConversion math/src/traits.rs:10)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["stark252", "bls12_381_base", "babybear",
                                  "goldilocks", "p448_goldilocks"])
def test_hex_and_bytes_roundtrip(name):
    field = ALL_FIELDS[name]
    p = field.p
    rng = np.random.default_rng(len(name))
    for _ in range(4):
        x = int.from_bytes(rng.bytes(64), "little") % p
        fe = field(x)
        assert field.from_hex(hex(x)).value == x
        assert field.from_hex(hex(x)[2:]).value == x
        bb = fe.to_bytes_be()
        assert len(bb) == field.params.num_bytes
        assert int.from_bytes(bb, "big") == x


def test_from_hex_garbage_rejected():
    field = ALL_FIELDS["stark252"]
    for bad in ("0xzz", "not hex", ""):
        with pytest.raises(Exception):
            field.from_hex(bad)
