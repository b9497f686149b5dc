"""Property-fuzz breadth: per-field arithmetic, curve-op, and parsing
fuzzers mirroring the reference's remaining ``fuzz/no_gpu_fuzz``
targets (``field_fuzzer`` per concrete field, ``curve_bls12_381``,
``curve_bn_254``, ``curve_grumpkin``, ``field_from_hex``,
``field_from_raw``) that :mod:`test_property_fuzz` does not cover.

Sizes stay tiny (4-lane device arrays, small scalars) so every example
reuses one cached compile per field.
"""

import pytest
from hypothesis import given, settings, strategies as st

from lambda_elliptic_curves_tpu.fields.zoo import (
    BLS12381Field, Goldilocks, Mersenne31, Stark252,
)
from lambda_elliptic_curves_tpu.curves.zoo import (
    BLS12381Curve, BN254Curve, GrumpkinCurve,
)
from lambda_elliptic_curves_tpu.utils.unsigned_integer import UnsignedInteger

_FAST = settings(max_examples=10, deadline=None)

_FIELDS = {
    "stark252": Stark252,
    "goldilocks": Goldilocks,
    "mersenne31": Mersenne31,
    "bls12381_base": BLS12381Field,
}


@pytest.mark.parametrize("fname", sorted(_FIELDS))
@_FAST
@given(data=st.data())
def test_field_device_vs_host_fuzz(fname, data):
    """Device digit-plane mul/add/sub/inverse vs exact host ints, per
    concrete field (per-field ``field_fuzzer`` targets)."""
    f = _FIELDS[fname]
    xs = data.draw(st.lists(st.integers(0, f.p - 1), min_size=4, max_size=4))
    ys = data.draw(st.lists(st.integers(1, f.p - 1), min_size=4, max_size=4))
    a, b = f.array(xs), f.array(ys)
    assert list(f.to_ints(f.mul(a, b))) == [x * y % f.p
                                            for x, y in zip(xs, ys)]
    assert list(f.to_ints(f.add(a, b))) == [(x + y) % f.p
                                            for x, y in zip(xs, ys)]
    assert list(f.to_ints(f.sub(a, b))) == [(x - y) % f.p
                                            for x, y in zip(xs, ys)]
    assert list(f.to_ints(f.batch_inverse(b))) == [pow(y, -1, f.p)
                                                   for y in ys]


@pytest.mark.parametrize("fname", sorted(_FIELDS))
@_FAST
@given(data=st.data())
def test_field_pow_square_fuzz(fname, data):
    f = _FIELDS[fname]
    xs = data.draw(st.lists(st.integers(0, f.p - 1), min_size=4, max_size=4))
    a = f.array(xs)
    assert list(f.to_ints(f.square(a))) == [x * x % f.p for x in xs]
    # host element pow vs python pow
    e = data.draw(st.integers(0, 1 << 40))
    assert (f(xs[0]) ** e).value == pow(xs[0], e, f.p)


_CURVES = {
    "bls12_381": BLS12381Curve,
    "bn_254": BN254Curve,
    "grumpkin": GrumpkinCurve,
}


@pytest.mark.parametrize("cname", sorted(_CURVES))
@_FAST
@given(k1=st.integers(0, 1 << 48), k2=st.integers(0, 1 << 48))
def test_curve_group_law_fuzz(cname, k1, k2):
    """(k1+k2)G == k1 G + k2 G, doubling == self-add, neutral absorbs
    (``curve_*`` fuzz targets)."""
    curve = _CURVES[cname]
    g = curve.generator()
    lhs = g.operate_with_self(k1 + k2)
    rhs = g.operate_with_self(k1).operate_with(g.operate_with_self(k2))
    assert lhs == rhs
    p1 = g.operate_with_self(k1 + 1)
    assert p1.double() == p1.operate_with(p1)
    assert p1.operate_with(curve.neutral()) == p1


@pytest.mark.parametrize("cname", sorted(_CURVES))
def test_curve_subgroup_order(cname):
    curve = _CURVES[cname]
    if not curve.order:
        pytest.skip("no subgroup order recorded")
    g = curve.generator()
    assert g.operate_with_self(curve.order).is_neutral_element()
    assert not g.operate_with_self(curve.order - 1).is_neutral_element()


@_FAST
@given(st.integers(0, 2**384 - 1))
def test_from_hex_roundtrip_fuzz(x):
    """Hex parse/print round trip (``field_from_hex`` parity)."""
    u = UnsignedInteger(384, x)
    assert int(UnsignedInteger.from_hex(384, u.to_hex())) == x
    assert int(UnsignedInteger.from_hex(384, hex(x))) == x


@_FAST
@given(st.binary(min_size=0, max_size=64))
def test_from_bytes_fuzz(raw):
    """Arbitrary raw bytes parse without crashing and round-trip
    (``field_from_raw`` parity)."""
    x = int.from_bytes(raw, "big")
    if x >= 1 << 256:
        return
    u = UnsignedInteger(256, x)
    assert int(UnsignedInteger.from_bytes_be(256, u.to_bytes_be())) == x


@_FAST
@given(st.lists(st.integers(0, Goldilocks.p - 1), min_size=2, max_size=5))
def test_batch_inverse_zero_free_fuzz(xs):
    """Montgomery-trick batch inversion against per-element host pow."""
    f = Goldilocks
    xs = [x or 1 for x in xs]
    pad = xs + [1] * (4 - len(xs)) if len(xs) < 4 else xs[:4]
    inv = list(f.to_ints(f.batch_inverse(f.array(pad))))
    assert inv == [pow(x, -1, f.p) for x in pad]
