"""Pairing tests: bilinearity, identities, subgroup errors, tower unit
ops, and a differential check of the fast twist-native path against the
generic E(Fp12) oracle.

Mirrors the reference's pairing test suites
(``bls12_381/pairing.rs:417-486``, ``bn_254/pairing.rs`` tests).
"""

import random

import pytest

from lambda_elliptic_curves_tpu.curves.pairings import (
    AffinePoint, BLS12377Pairing, BLS12381Pairing, BN254Pairing,
    compute_batch, pairing, pairing_generic,
)
from lambda_elliptic_curves_tpu.utils.errors import PairingError

CONFIGS = [BLS12381Pairing, BN254Pairing, BLS12377Pairing]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c.name)
def test_tower_ops(cfg):
    """Unit checks for the fast tuple tower: inv/sq/frobenius/sparse
    products/cyclotomic ops against the full generic operations."""
    t = cfg.tower
    p = t.p
    rng = random.Random(42)

    def rf2():
        return (rng.randrange(p), rng.randrange(p))

    def rf12():
        return (tuple(rf2() for _ in range(3)),
                tuple(rf2() for _ in range(3)))

    def f12_pow(x, e):
        out = t.one()
        acc = x
        while e:
            if e & 1:
                out = t.f12_mul(out, acc)
            acc = t.f12_sq(acc)
            e >>= 1
        return out

    a = rf12()
    assert t.f12_mul(a, t.f12_inv(a)) == t.one()
    assert t.f12_sq(a) == t.f12_mul(a, a)
    assert t.frobenius(a, 1) == f12_pow(a, p)
    assert t.frobenius(a, 2) == f12_pow(a, p * p)

    c0, c1, c4 = rf2(), rf2(), rf2()
    sparse014 = ((c0, c1, (0, 0)), ((0, 0), c4, (0, 0)))
    assert t.mul_by_014(a, c0, c1, c4) == t.f12_mul(a, sparse014)
    sparse034 = ((c0, (0, 0), (0, 0)), (c1, c4, (0, 0)))
    assert t.mul_by_034(a, c0, c1, c4) == t.f12_mul(a, sparse034)

    # cyclotomic ops on an easy-part image (guaranteed in the subgroup)
    g = t.f12_mul(t.f12_conj(a), t.f12_inv(a))
    g = t.f12_mul(t.frobenius(g, 2), g)
    assert t.cyclo_sq(g) == t.f12_mul(g, g)
    assert t.cyclo_pow(g, 98765) == f12_pow(g, 98765)
    assert t.cyclo_pow(g, -3) == f12_pow(t.f12_conj(g), 3)


def test_fast_pairing_matches_generic_oracle():
    """The twist-native fast path equals the affine E(Fp12) oracle
    (exact final-exponentiation output, not just bilinear-equivalent)."""
    cfg = BN254Pairing
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    fast = pairing(cfg, g1.operate_with_self(3), g2.mul(11))
    ref = pairing_generic(cfg, g1.operate_with_self(3), g2.mul(11))
    assert fast == ref


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c.name)
def test_g2_generator_on_twist(cfg):
    g2 = cfg.g2_generator()
    f2 = cfg.fp2
    lhs = g2.y * g2.y
    rhs = g2.x * g2.x * g2.x + f2(cfg.twist_b)
    assert lhs == rhs
    # order check
    assert g2.mul(cfg.r).inf


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c.name)
def test_bilinearity(cfg):
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    a, b = 5, 7
    e_ab = pairing(cfg, g1.operate_with_self(a), g2.mul(b))
    e_base = pairing(cfg, g1, g2)
    assert e_ab == e_base ** (a * b)
    assert not e_base.is_zero()
    assert e_base ** cfg.r == cfg.fp12(1)


def test_batch_and_identity():
    cfg = BN254Pairing
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    # e(2P, Q) * e(-2P, Q) == 1
    batch = compute_batch(cfg, [
        (g1.operate_with_self(2), g2),
        (g1.operate_with_self(2).neg(), g2),
    ])
    assert batch == cfg.fp12(1)
    # neutral inputs give one
    assert pairing(cfg, g1.curve.neutral(), g2) == cfg.fp12(1)


def test_subgroup_error():
    cfg = BLS12381Pairing
    g1 = cfg.g1_curve.generator()
    # a point on the twist but outside the r-torsion: scale the generator's
    # y by a wrong factor -> not on curve; instead use a small-order trick:
    # point on E'(Fp2) not in subgroup found by hashing x candidates
    f2 = cfg.fp2
    x = f2(1)
    while True:
        rhs = x * x * x + f2(cfg.twist_b)
        # try to find y via brute-force square root in Fp2 using pow when
        # possible; skip to next x if not a square
        y = _fp2_sqrt(cfg, rhs)
        if y is not None:
            q = AffinePoint(f2, x, y)
            if not q.mul(cfg.r).inf:
                break
        x = x + f2(1)
    with pytest.raises(PairingError):
        pairing(cfg, g1, q)


def _fp2_sqrt(cfg, v):
    """Square root in Fp2 via norm/trace (p ≡ 3 mod 4 case), or None."""
    f2 = cfg.fp2
    p = cfg.g1_curve.field.p
    a, b = v.value
    if b == 0:
        r = cfg.g1_curve.field.params.sqrt(a)
        if r is not None:
            return f2((r, 0))
        # sqrt of non-residue: sqrt(a) = sqrt(a/nr) * sqrt(nr) with nr = -1
        r = cfg.g1_curve.field.params.sqrt((-a) % p)
        return f2((0, r)) if r is not None else None
    norm = (a * a + b * b) % p  # N(v) for u^2 = -1
    n = cfg.g1_curve.field.params.sqrt(norm)
    if n is None:
        return None
    for sign in (1, -1):
        half = (a + sign * n) * pow(2, -1, p) % p
        c = cfg.g1_curve.field.params.sqrt(half)
        if c is None or c == 0:
            continue
        d = b * pow(2 * c, -1, p) % p
        cand = f2((c, d))
        if cand * cand == v:
            return cand
    return None
