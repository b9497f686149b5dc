"""Device tower (Fp6/Fp12) + batched device pairings vs host oracles.

Parity targets: generic cubic extension (``math/src/field/extensions/
cubic.rs:12``), the BLS12-381 Fp6/Fp12 tower (``curves/bls12_381/
field_extension.rs:23,28``) and ``compute_batch``
(``curves/bls12_381/pairing.rs:96``).
"""

import random

import pytest

from lambda_elliptic_curves_tpu.curves.pairings import (
    BLS12381Pairing, BN254Pairing, compute_batch, miller_loop, pairing,
)
from lambda_elliptic_curves_tpu.curves.pairings_device import (
    compute_batch_device, device_tower, miller_loop_batch, _miller_jit,
)


def _rand_fp2(rng, p):
    return (rng.randrange(p), rng.randrange(p))


def _rand_fp6(rng, p):
    return tuple(_rand_fp2(rng, p) for _ in range(3))


def _rand_fp12(rng, p):
    return tuple(_rand_fp6(rng, p) for _ in range(2))


@pytest.mark.parametrize("cfg", [BLS12381Pairing, BN254Pairing],
                         ids=["bls12_381", "bn254"])
def test_device_fp6_mul_inv_vs_host(cfg):
    fp2d, fp6d, fp12d = device_tower(cfg)
    t = cfg.tower
    rng = random.Random(5)
    p = cfg.g1_curve.field.p
    a = [_rand_fp6(rng, p) for _ in range(4)]
    b = [_rand_fp6(rng, p) for _ in range(4)]
    da, db = fp6d.array(a), fp6d.array(b)
    got = fp6d.to_tuples(fp6d.mul(da, db))
    want = [t.f6_mul(x, y) for x, y in zip(a, b)]
    assert got == want
    # inverse: a * a^-1 == 1
    inv = fp6d.to_tuples(fp6d.inv(da))
    for x, ix in zip(a, inv):
        assert t.f6_mul(x, ix) == ((1, 0), (0, 0), (0, 0))


@pytest.mark.parametrize("cfg", [BLS12381Pairing, BN254Pairing],
                         ids=["bls12_381", "bn254"])
def test_device_fp12_mul_sq_vs_host(cfg):
    fp2d, fp6d, fp12d = device_tower(cfg)
    t = cfg.tower
    rng = random.Random(7)
    p = cfg.g1_curve.field.p
    a = [_rand_fp12(rng, p) for _ in range(3)]
    b = [_rand_fp12(rng, p) for _ in range(3)]
    da, db = fp12d.array(a), fp12d.array(b)
    got = fp12d.to_tuples(fp12d.mul(da, db))
    want = [t.f12_mul(x, y) for x, y in zip(a, b)]
    assert got == want
    got_sq = fp12d.to_tuples(fp12d.square(da))
    want_sq = [t.f12_sq(x) for x in a]
    assert got_sq == want_sq
    # mul_by_gen == f6_mul_by_v through the w^2 = v tower detection
    g6 = fp6d.array([_rand_fp6(rng, p) for _ in range(3)])
    got_v = fp6d.to_tuples(fp6d.mul_by_gen(g6))
    want_v = [t.f6_mul_by_v(x) for x in fp6d.to_tuples(g6)]
    assert got_v == want_v


@pytest.mark.parametrize("cfg", [BLS12381Pairing, BN254Pairing],
                         ids=["bls12_381", "bn254"])
def test_miller_loop_batch_vs_host(cfg):
    """Batched device Miller loops reproduce the host twist-native loop."""
    fp2d, fp6d, fp12d = device_tower(cfg)
    base = cfg.g1_curve.field
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    pairs = [(g1, g2), (g1.operate_with_self(3), g2.mul(5)),
             (g1.operate_with_self(11), g2)]
    want = [miller_loop(cfg, p, q) for p, q in pairs]

    affs = [p.to_affine() for p, _ in pairs]
    xp = base.array([int(a.x) for a in affs])
    yp = base.array([int(a.y) for a in affs])
    xq = fp2d.array([tuple(int(c) for c in q.x.value) for _, q in pairs])
    yq = fp2d.array([tuple(int(c) for c in q.y.value) for _, q in pairs])
    got = fp12d.to_tuples(_miller_jit(cfg)(xp, yp, xq, yq))
    assert got == want


def test_compute_batch_device_matches_host():
    cfg = BLS12381Pairing
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    pairs = [(g1, g2), (g1.operate_with_self(2), g2.mul(7)),
             (g1.operate_with_self(5), g2.mul(3))]
    got = compute_batch_device(cfg, pairs)
    want = compute_batch(cfg, pairs)
    assert got == want


def test_compute_batch_device_bilinearity():
    """e(aP, bQ) == e(P, Q)^(ab) through the device path (single pair)."""
    cfg = BN254Pairing
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    e1 = compute_batch_device(cfg, [(g1, g2)])
    e2 = compute_batch_device(cfg, [(g1.operate_with_self(3), g2.mul(4))])
    assert e2 == e1 ** 12


def test_compute_batch_device_infinity_and_padding():
    """Infinity pairs are skipped; padding dummies don't leak into the
    product (batch of 3 pads to 4)."""
    cfg = BLS12381Pairing
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    inf1 = g1.operate_with_self(0)
    pairs = [(g1, g2), (inf1, g2), (g1.operate_with_self(2), g2.mul(2))]
    got = compute_batch_device(cfg, pairs)
    want = compute_batch(cfg, pairs)
    assert got == want
