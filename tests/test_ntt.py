"""NTT vs naive DFT oracle + reference-convention checks.

Mirrors the reference's FFT cross-checks (``math/src/fft/test_helpers.rs``,
proptests in ``math/src/fft/polynomial.rs``).
"""

import random

import pytest

from lambda_elliptic_curves_tpu.fields import Stark252, BabyBear, U64TestField
from lambda_elliptic_curves_tpu.poly import ntt, Polynomial

FIELDS = [BabyBear, U64TestField, Stark252]


def naive_dft(field, coeffs, root):
    """Exact DFT oracle with python ints."""
    n = len(coeffs)
    p = field.p
    return [
        sum(c * pow(root, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("n", [4, 16])
def test_fft_matches_naive_dft(fp, n):
    rng = random.Random(42)
    coeffs = [rng.randrange(fp.p) for _ in range(n)]
    root = fp.params.primitive_root_of_unity(n.bit_length() - 1)
    expected = naive_dft(fp, coeffs, root)
    got = fp.to_ints(ntt.fft(fp.array(coeffs), fp))
    assert [int(v) for v in got] == expected


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_ifft_roundtrip(fp):
    rng = random.Random(7)
    coeffs = [rng.randrange(fp.p) for _ in range(8)]
    arr = fp.array(coeffs)
    back = ntt.ifft(ntt.fft(arr, fp), fp)
    assert [int(v) for v in fp.to_ints(back)] == coeffs


def test_evaluate_fft_blowup_and_offset():
    fp = BabyBear
    rng = random.Random(3)
    coeffs = [rng.randrange(fp.p) for _ in range(4)]
    poly = Polynomial(fp, coeffs)
    # blowup 2 -> evaluations over the size-8 domain
    evals = fp.to_ints(ntt.evaluate_fft(fp, fp.array(coeffs), blowup_factor=2))
    w8 = fp(fp.params.primitive_root_of_unity(3))
    for i, e in enumerate(evals):
        assert int(e) == poly.evaluate(w8**i).value
    # offset
    offset = 3
    evals = fp.to_ints(
        ntt.evaluate_offset_fft(fp, fp.array(coeffs), blowup_factor=1, offset=offset)
    )
    w4 = fp(fp.params.primitive_root_of_unity(2))
    for i, e in enumerate(evals):
        assert int(e) == poly.evaluate(fp(offset) * w4**i).value
    # interpolate_offset_fft inverts it
    back = ntt.interpolate_offset_fft(fp, fp.array([int(e) for e in evals]), offset)
    assert [int(v) for v in fp.to_ints(back)] == coeffs


def test_batched_fft():
    fp = BabyBear
    rng = random.Random(9)
    cols = [[rng.randrange(fp.p) for _ in range(8)] for _ in range(3)]
    arr = fp.array(cols)  # (K, 3, 8)
    out = fp.to_ints(ntt.fft(arr, fp))
    root = fp.params.primitive_root_of_unity(3)
    for c in range(3):
        assert [int(v) for v in out[c]] == naive_dft(fp, cols[c], root)


def test_twiddle_configs_match_reference_semantics():
    fp = U64TestField
    nat = fp.to_ints(ntt.get_twiddles(fp, 3, "natural"))
    br = fp.to_ints(ntt.get_twiddles(fp, 3, "bit_reverse"))
    root = fp.params.primitive_root_of_unity(3)
    assert [int(v) for v in nat] == [pow(root, i, fp.p) for i in range(4)]
    # bit reverse of [w0,w1,w2,w3] = [w0,w2,w1,w3]
    assert [int(v) for v in br] == [pow(root, i, fp.p) for i in (0, 2, 1, 3)]
    inv = fp.to_ints(ntt.get_twiddles(fp, 3, "natural_inversed"))
    rinv = pow(root, fp.p - 2, fp.p)
    assert [int(v) for v in inv] == [pow(rinv, i, fp.p) for i in range(4)]


def test_polynomial_host_ops():
    fp = U64TestField
    x = Polynomial(fp, [0, 1])
    p = x * x + x * 3 + 2  # (x+1)(x+2)
    assert p.evaluate(fp(5)).value == 42
    q = p.ruffini_division(fp(-1))
    assert q == Polynomial(fp, [2, 1])
    quo, rem = p.long_division_with_remainder(Polynomial(fp, [2, 1]))
    assert quo == Polynomial(fp, [1, 1]) and rem.is_zero()
    g, s, t = (x * x - 1).xgcd(x - 1) if False else (None, None, None)
    a, b = Polynomial(fp, [-1, 0, 1]), Polynomial(fp, [-1, 1])
    g, s, t = a.xgcd(b)
    assert g == Polynomial(fp, [-1, 1])  # gcd = x - 1 (monic)
    assert s * a + t * b == g
    # interpolate
    xs = [fp(v) for v in (1, 2, 3)]
    ys = [fp(v) for v in (4, 9, 16)]
    ip = Polynomial.interpolate(xs, ys)
    for xv, yv in zip(xs, ys):
        assert ip.evaluate(xv) == yv
    # break_in_parts
    h = Polynomial(fp, [1, 2, 3, 4, 5, 6])
    parts = h.break_in_parts(2)
    assert parts[0] == Polynomial(fp, [1, 3, 5])
    assert parts[1] == Polynomial(fp, [2, 4, 6])
