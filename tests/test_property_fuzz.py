"""Property-based differential tests — the TPU-build counterpart of the
reference's fuzz targets (``fuzz/no_gpu_fuzz/fuzz_targets``: per-field
arithmetic fuzzers, ``fft_diff``, ``polynomial_fft_diff``,
``twiddles_generation_diff``, ``deserialize_stark_proof``).

Small fields and sizes keep each example a cached compile; hypothesis
drives the value space.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252
from lambda_elliptic_curves_tpu.poly import ntt
from lambda_elliptic_curves_tpu.poly.polynomial import Polynomial
from lambda_elliptic_curves_tpu.utils.errors import DeserializationError
from lambda_elliptic_curves_tpu.utils.serialization import deserialize_proof
from lambda_elliptic_curves_tpu.utils.unsigned_integer import UnsignedInteger

_FAST = settings(max_examples=10, deadline=None)


@_FAST
@given(st.lists(st.integers(0, BabyBear.p - 1), min_size=4, max_size=4),
       st.lists(st.integers(0, BabyBear.p - 1), min_size=4, max_size=4))
def test_field_arithmetic_fuzz(xs, ys):
    f = BabyBear
    a, b = f.array(xs), f.array(ys)
    assert list(f.to_ints(f.mul(a, b))) == [x * y % f.p for x, y in zip(xs, ys)]
    assert list(f.to_ints(f.add(a, b))) == [(x + y) % f.p for x, y in zip(xs, ys)]
    assert list(f.to_ints(f.sub(a, b))) == [(x - y) % f.p for x, y in zip(xs, ys)]


@_FAST
@given(st.lists(st.integers(0, BabyBear.p - 1), min_size=8, max_size=8))
def test_fft_diff_vs_naive_dft(coeffs):
    f = BabyBear
    n = len(coeffs)
    w = f.params.primitive_root_of_unity(n.bit_length() - 1)
    got = list(f.to_ints(ntt.fft(f.array(coeffs), f)))
    want = [sum(c * pow(w, i * j, f.p) for j, c in enumerate(coeffs)) % f.p
            for i in range(n)]
    assert got == want


@_FAST
@given(st.lists(st.integers(0, BabyBear.p - 1), min_size=3, max_size=6))
def test_polynomial_fft_diff(coeffs):
    """evaluate_fft agrees with Horner evaluation at the domain points
    (``polynomial_fft_diff`` parity)."""
    f = BabyBear
    pol = Polynomial(f, coeffs)
    ev = f.to_ints(ntt.evaluate_fft(f, f.array(coeffs)))
    n = len(ev)
    w = f.params.primitive_root_of_unity(n.bit_length() - 1)
    for i in (0, n - 1, n // 2):
        assert int(ev[i]) == pol.evaluate(f(pow(w, i, f.p))).value


def test_twiddles_generation_diff():
    """The four RootsConfig orders are permutations/inversions of one
    table (``twiddles_generation_diff`` parity)."""
    f = BabyBear
    order = 4
    nat = list(f.to_ints(ntt.get_powers_of_primitive_root(f, order, 8, "natural")))
    br = list(f.to_ints(ntt.get_powers_of_primitive_root(f, order, 8, "bit_reverse")))
    nat_inv = list(f.to_ints(
        ntt.get_powers_of_primitive_root(f, order, 8, "natural_inversed")))
    idx = [0, 4, 2, 6, 1, 5, 3, 7]
    assert br == [nat[i] for i in idx]
    assert all(a * b % f.p == 1 or (a == 0 and b == 0)
               for a, b in zip(nat[1:], nat_inv[1:]))
    assert nat[0] == nat_inv[0] == 1


@_FAST
@given(st.binary(min_size=0, max_size=200))
def test_deserialize_stark_proof_robust(data):
    """Arbitrary bytes never crash the proof parser
    (``deserialize_stark_proof`` fuzz parity)."""
    try:
        deserialize_proof(data)
    except DeserializationError:
        pass


@_FAST
@given(st.integers(0, 2**256 - 1), st.integers(0, 2**256 - 1))
def test_unsigned_integer_fuzz(x, y):
    a = UnsignedInteger(256, x)
    b = UnsignedInteger(256, y)
    m = (1 << 256)
    assert int(a + b) == (x + y) % m
    assert int(a - b) == (x - y) % m
    assert int(a * b) == (x * y) % m
    if y:
        q, r = a.div_rem(b)
        assert int(q) == x // y and int(r) == x % y
    assert int(a ^ b) == x ^ y


def test_stark252_mont_roundtrip_fuzz():
    rng = np.random.default_rng(5)
    xs = [int.from_bytes(rng.bytes(31), "big") % Stark252.p for _ in range(8)]
    arr = Stark252.array(xs)
    assert list(Stark252.to_ints(arr)) == xs
