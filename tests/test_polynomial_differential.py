"""Dense-polynomial algebra fuzzing vs naive host references — parity
with the reference's polynomial proptests (``math/src/polynomial/mod.rs``
test modules + ``polynomial_fft_diff`` fuzz target)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252, U64TestField
from lambda_elliptic_curves_tpu.poly.polynomial import Polynomial

_FAST = settings(max_examples=15, deadline=None)

F = U64TestField
_coeffs = st.lists(st.integers(0, F.p - 1), min_size=0, max_size=9)


def _naive_mul(a, b, p):
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % p
    return out


def _trim(c, p):
    c = [v % p for v in c]
    while c and c[-1] == 0:
        c.pop()
    return c


@_FAST
@given(_coeffs, _coeffs)
def test_poly_mul_matches_schoolbook(a, b):
    pa = Polynomial(F, a)
    pb = Polynomial(F, b)
    got = [c.value for c in (pa * pb).coefficients]
    assert _trim(got, F.p) == _trim(_naive_mul(a, b, F.p), F.p)


@_FAST
@given(_coeffs, _coeffs)
def test_poly_add_sub_ring_axioms(a, b):
    pa, pb = Polynomial(F, a), Polynomial(F, b)
    assert (pa + pb) - pb == pa
    assert pa + pb == pb + pa
    assert (pa - pa).is_zero()


@_FAST
@given(_coeffs, st.integers(0, F.p - 1))
def test_ruffini_division_identity(a, r):
    """p(x) = (x - r) * q(x) + p(r)  (``polynomial/mod.rs:157``)."""
    pa = Polynomial(F, a)
    q = pa.ruffini_division(F(r))
    xr = Polynomial(F, [(-r) % F.p, 1])
    recon = q * xr + Polynomial(F, [pa.evaluate(F(r)).value])
    assert recon == pa


@_FAST
@given(_coeffs, _coeffs)
def test_long_division_identity(a, b):
    pb = Polynomial(F, b)
    if pb.is_zero():
        return
    pa = Polynomial(F, a)
    q, r = pa.long_division_with_remainder(pb)
    assert q * pb + r == pa
    assert r.is_zero() or r.degree() < pb.degree()


@_FAST
@given(_coeffs, _coeffs)
def test_xgcd_bezout(a, b):
    pa, pb = Polynomial(F, a), Polynomial(F, b)
    if pa.is_zero() and pb.is_zero():
        return
    g, s, t = pa.xgcd(pb)
    assert s * pa + t * pb == g


@_FAST
@given(st.lists(st.integers(0, F.p - 1), min_size=8, max_size=8),
       st.integers(2, 4))
def test_break_in_parts_reassembles(a, parts):
    """p(x) = sum_i x^i * p_i(x^parts)  (``polynomial/mod.rs:289``)."""
    pa = Polynomial(F, a)
    ps = pa.break_in_parts(parts)
    x = F(5)
    xp = x**parts
    got = sum((x**i * ps[i].evaluate(xp) for i in range(parts)), F(0))
    assert got == pa.evaluate(x)


def test_interpolate_roundtrip_random_points():
    rng = np.random.default_rng(0)
    for n in (1, 2, 5, 8):
        xs_int = list({int(v) for v in rng.integers(0, F.p, 4 * n, dtype=np.uint64)})[:n]
        xs = [F(v) for v in xs_int]
        ys = [F(int(v)) for v in rng.integers(0, F.p, len(xs), dtype=np.uint64)]
        poly = Polynomial.interpolate(xs, ys)
        for x, y in zip(xs, ys):
            assert poly.evaluate(x) == y


@_FAST
@given(_coeffs, st.integers(1, F.p - 1))
def test_scale_matches_substitution(a, c):
    """scale(c) must satisfy q(x) = p(c*x)  (``polynomial/mod.rs:259``)."""
    pa = Polynomial(F, a)
    q = pa.scale(F(c))
    x = F(7)
    assert q.evaluate(x) == pa.evaluate(F(c) * x)


def test_new_monomial_and_leading_coefficient():
    m = Polynomial.new_monomial(F(3), 4)
    assert m.degree() == 4
    assert m.leading_coefficient() == F(3)
    assert m.evaluate(F(2)) == F(3 * 16 % F.p)


# ---------------------------------------------------------------------------
# multilinear polynomials (dense + sparse; ``dense_multilinear_poly.rs``,
# ``sparse_multilinear_poly.rs``)
# ---------------------------------------------------------------------------

def test_dense_multilinear_fix_variable_order():
    from lambda_elliptic_curves_tpu.poly.multilinear import (
        DenseMultilinearPolynomial,
    )

    f = BabyBear
    rng = np.random.default_rng(1)
    evals = [f(int(v)) for v in rng.integers(0, f.p, 8)]
    poly = DenseMultilinearPolynomial(f, evals)
    point = [f(3), f(5), f(7)]
    direct = poly.evaluate(point)
    stepped = poly
    for r in point:
        stepped = stepped.fix_variable(r)
    assert stepped.to_list()[0] == direct


def test_sparse_vs_dense_multilinear_agree():
    from lambda_elliptic_curves_tpu.poly.multilinear import (
        DenseMultilinearPolynomial, SparseMultilinearPolynomial,
    )

    f = BabyBear
    rng = np.random.default_rng(2)
    n_vars = 3
    dense_evals = [f(0)] * (1 << n_vars)
    entries = []
    for idx in (1, 4, 6):
        v = f(int(rng.integers(1, f.p)))
        dense_evals[idx] = v
        entries.append((idx, v))
    dense = DenseMultilinearPolynomial(f, dense_evals)
    sparse = SparseMultilinearPolynomial(f, n_vars, entries)
    pt = [f(9), f(11), f(13)]
    assert sparse.evaluate(pt) == dense.evaluate(pt)


def test_evaluate_slice_matches_pointwise():
    f = Stark252
    pa = Polynomial(f, [1, 2, 3, 4])
    xs = [f(2), f(3), f(10)]
    assert pa.evaluate_slice(xs) == [pa.evaluate(x) for x in xs]
