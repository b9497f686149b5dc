"""Circle group / CFFT tests (parity: ``math/src/circle/*`` test suites)."""

import random

from lambda_elliptic_curves_tpu.circle import (
    CirclePoint, Coset, evaluate_cfft, interpolate_cfft, M31,
)


def test_generator_orders():
    g = CirclePoint.generator()
    # 2^31 * g == zero, 2^30 * g != zero
    assert g.repeated_double(31) == CirclePoint.zero()
    assert g.repeated_double(30) != CirclePoint.zero()
    g8 = CirclePoint.get_generator_of_subgroup(3)
    assert g8.repeated_double(3) == CirclePoint.zero()
    assert g8.repeated_double(2) != CirclePoint.zero()


def test_group_law():
    g = CirclePoint.generator()
    assert g + CirclePoint.zero() == g
    assert g + g == g.double()
    assert g + g.conjugate() == CirclePoint.zero()
    assert g.scalar_mul(5) == g + g + g + g + g


def _basis_eval(coeffs, pt):
    """Evaluate in the basis y^k0 * v1^k1 * v2^k2..., v1=x, v_{j+1}=2v_j^2-1."""
    n = len(coeffs)
    bits = n.bit_length() - 1
    total = 0
    for k, c in enumerate(coeffs):
        term = c
        if k & 1:
            term = term * pt.y % M31
        v = pt.x
        for b in range(1, bits):
            if (k >> b) & 1:
                term = term * v % M31
            v = (2 * v * v - 1) % M31
        total = (total + term) % M31
    return total


def test_evaluate_cfft_matches_basis():
    rng = random.Random(3)
    for n in (4, 8, 16):
        coeffs = [rng.randrange(M31) for _ in range(n)]
        evals = evaluate_cfft(coeffs)
        points = Coset.new_standard(n.bit_length() - 1).points()
        expected = [_basis_eval(coeffs, p) for p in points]
        assert evals == expected


def test_cfft_roundtrip():
    rng = random.Random(5)
    for n in (4, 8, 32):
        coeffs = [rng.randrange(M31) for _ in range(n)]
        assert interpolate_cfft(evaluate_cfft(coeffs)) == coeffs
    assert interpolate_cfft([]) == []
