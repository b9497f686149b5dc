"""Per-field axiom + known-answer suites across the whole zoo (parity
role: the reference's colocated per-field ``#[cfg(test)]`` blocks, e.g.
``math/src/field/fields/fft_friendly/babybear.rs`` tests, and the
fuzz-target arithmetic checks in ``fuzz/no_gpu_fuzz``).

Each field gets: ring axioms on pseudo-random samples, inverse/pow/sqrt
laws, Fermat, byte round-trips, and device-vs-host agreement for the
batched kernels.
"""

import random

import pytest

from lambda_elliptic_curves_tpu.fields import zoo as FZ

ALL_FIELDS = [
    FZ.Stark252, FZ.Stark101, FZ.BabyBear, FZ.BabyBearFull, FZ.Goldilocks,
    FZ.Mersenne31, FZ.BLS12381Field, FZ.BLS12381Fr, FZ.BLS12377Field,
    FZ.BLS12377Fr, FZ.BN254Field, FZ.BN254Fr, FZ.PallasField, FZ.VestaField,
    FZ.Secp256k1Field, FZ.Secp256k1Fr, FZ.Secp256r1Field,
]
IDS = [f.name for f in ALL_FIELDS]


def _samples(field, k=6, seed=1234):
    rng = random.Random(seed ^ hash(field.name) & 0xFFFF)
    vals = [0, 1, field.p - 1] + [rng.randrange(field.p) for _ in range(k)]
    return vals


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_ring_axioms(field):
    vals = _samples(field)
    f = field
    a, b, c = f(vals[3]), f(vals[4]), f(vals[5])
    assert a + b == b + a
    assert a * b == b * a
    assert (a + b) + c == a + (b + c)
    assert (a * b) * c == a * (b * c)
    assert a * (b + c) == a * b + a * c
    assert a + f(0) == a
    assert a * f(1) == a
    assert a - a == f(0)
    assert a + (-a) == f(0)


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_inverse_and_fermat(field):
    f = field
    for v in _samples(f):
        if v % f.p == 0:
            continue
        e = f(v)
        assert e * e.inv() == f(1)
        # Fermat little theorem: a^(p-1) = 1
        assert e ** (f.p - 1) == f(1)


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_pow_laws(field):
    f = field
    a = f(_samples(f)[4])
    assert a ** 0 == f(1)
    assert a ** 1 == a
    assert a ** 5 == a * a * a * a * a
    assert (a ** 3) * (a ** 4) == a ** 7


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_sqrt_of_squares(field):
    f = field
    for v in _samples(f)[3:6]:
        sq = f(v) * f(v)
        roots = sq.sqrt()
        assert roots is not None
        r1, r2 = roots
        assert r1 * r1 == sq and r2 * r2 == sq


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_byte_roundtrip(field):
    from lambda_elliptic_curves_tpu.fields.element import FieldElement

    f = field
    for v in _samples(f)[:5]:
        e = f(v)
        assert FieldElement.from_bytes_be(f, e.to_bytes_be()) == e
        assert FieldElement.from_bytes_le(f, e.to_bytes_le()) == e


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_device_matches_host(field):
    f = field
    vals = _samples(f)
    xs, ys = vals[: len(vals) // 2 * 2 : 2], vals[1 :: 2]
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    ax, ay = f.array(xs), f.array(ys)
    mul = [int(v) for v in f.to_ints(f.mul(ax, ay))]
    add = [int(v) for v in f.to_ints(f.add(ax, ay))]
    sub = [int(v) for v in f.to_ints(f.sub(ax, ay))]
    for i in range(n):
        assert mul[i] == (f(xs[i]) * f(ys[i])).value
        assert add[i] == (f(xs[i]) + f(ys[i])).value
        assert sub[i] == (f(xs[i]) - f(ys[i])).value


@pytest.mark.parametrize("field", ALL_FIELDS, ids=IDS)
def test_batch_inverse_device(field):
    f = field
    vals = [v for v in _samples(f) if v % f.p != 0][:5]
    arr = f.array(vals)
    inv = f.to_ints(f.batch_inverse(arr))
    for v, iv in zip(vals, inv):
        assert (f(v) * f(int(iv))).value == 1


# known-answer pins for the headline fields (reference KATs)

def test_stark252_known_values():
    f = FZ.Stark252
    assert f.p == (1 << 251) + 17 * (1 << 192) + 1
    assert (f(2) ** 192).value == 1 << 192
    assert f(f.p - 1) * f(f.p - 1) == f(1)


def test_babybear_two_adicity_root():
    f = FZ.BabyBear
    assert f.p == 2013265921
    w = f.params.primitive_root_of_unity(f.params.two_adicity)
    assert pow(w, 1 << f.params.two_adicity, f.p) == 1
    assert pow(w, 1 << (f.params.two_adicity - 1), f.p) == f.p - 1


def test_goldilocks_epsilon_identity():
    f = FZ.Goldilocks
    assert f.p == (1 << 64) - (1 << 32) + 1
    # 2^64 = 2^32 - 1 (mod p)
    assert pow(2, 64, f.p) == (1 << 32) - 1


def test_mersenne31_shift_reduction():
    f = FZ.Mersenne31
    assert f.p == (1 << 31) - 1
    assert (f(1 << 30) * f(4)).value == 2  # 2^32 = 2 mod (2^31 - 1)
