"""G2 (twist curve over Fp2) tests: device flat-Fp2 field, Jacobian group
law, and G2 MSM vs the host oracle.

Mirrors the reference's twist-curve tests (``bls12_381/twist.rs`` /
``bn_254/twist.rs`` test mods) and the genericity of ``pippenger::msm``
over ``IsGroup`` (``msm/pippenger.rs:19``).
"""

import random

import pytest

from lambda_elliptic_curves_tpu.curves import (
    TwistJacobianOps, bls12_381_twist, bn254_twist, msm,
    msm_g2_naive_host,
)
from lambda_elliptic_curves_tpu.fields.extensions import DeviceQuadraticField
from lambda_elliptic_curves_tpu.fields import zoo as FZ

TWISTS = [bls12_381_twist, bn254_twist]


def test_device_fp2_field_ops():
    """Flat-layout device Fp2 arithmetic vs host ExtensionField."""
    tw = bn254_twist()
    f2d = tw.field
    host = tw.host_field
    rng = random.Random(3)
    p = host.p
    pairs_a = [(rng.randrange(p), rng.randrange(p)) for _ in range(8)]
    pairs_b = [(rng.randrange(p), rng.randrange(p)) for _ in range(8)]
    a = f2d.array(pairs_a)
    b = f2d.array(pairs_b)

    def host_vals(op):
        return [op(host(x), host(y)).value for x, y in zip(pairs_a, pairs_b)]

    assert f2d.to_tuples(f2d.add(a, b)) == host_vals(lambda x, y: x + y)
    assert f2d.to_tuples(f2d.sub(a, b)) == host_vals(lambda x, y: x - y)
    assert f2d.to_tuples(f2d.mul(a, b)) == host_vals(lambda x, y: x * y)
    assert f2d.to_tuples(f2d.inv(a)) == [
        host(x).inv().value for x in pairs_a
    ]
    assert f2d.to_tuples(f2d.batch_inverse(b)) == [
        host(x).inv().value for x in pairs_b
    ]
    assert f2d.to_tuples(f2d.pow(a, 31)) == [
        (host(x) ** 31).value for x in pairs_a
    ]
    # embed: lift base-field values
    base_vals = [rng.randrange(p) for _ in range(4)]
    lifted = f2d.embed(FZ.BN254Field.array(base_vals))
    assert f2d.to_tuples(lifted) == [(v, 0) for v in base_vals]


def test_device_fp4_tower_ops():
    """Nested DeviceQuadraticField = Fp4 over BabyBear, vs host tower."""
    from lambda_elliptic_curves_tpu.fields.extensions import ExtensionField

    bb = FZ.BabyBear
    f2d = DeviceQuadraticField(bb, 11, name="babybear_fp2")
    f4d = DeviceQuadraticField(f2d, ((0, 1)), name="babybear_fp4")
    h2 = ExtensionField("bb2", bb, 11, 2)
    h4 = ExtensionField("bb4", h2, (0, 1), 2)
    rng = random.Random(5)
    p = bb.p

    def rq():
        return ((rng.randrange(p), rng.randrange(p)),
                (rng.randrange(p), rng.randrange(p)))

    va = [rq() for _ in range(6)]
    vb = [rq() for _ in range(6)]
    a = f4d.array(va)
    b = f4d.array(vb)
    assert f4d.to_tuples(f4d.mul(a, b)) == [
        (h4(x) * h4(y)).value for x, y in zip(va, vb)
    ]
    assert f4d.to_tuples(f4d.inv(a)) == [h4(x).inv().value for x in va]
    assert f4d.to_tuples(f4d.batch_inverse(b)) == [
        h4(x).inv().value for x in vb
    ]


@pytest.mark.parametrize("mk", TWISTS, ids=lambda m: m().name)
def test_g2_generator_and_group_law(mk):
    tw = mk()
    g = tw.generator()
    assert tw.defining_equation(g.x, g.y)
    ops = TwistJacobianOps(tw)
    pts = [g, g.double(), g.mul(5), tw.neutral()]
    dev = ops.from_host(pts)
    # double on device == host double
    doubled = ops.to_host(ops.double(dev))
    for h, d in zip(pts, doubled):
        hd = h.double()
        assert (hd.inf and d.inf) or (hd.x == d.x and hd.y == d.y)
    # add: P + 2P == 3P
    shifted = ops.from_host([pts[1], pts[2], tw.neutral(), pts[0]])
    summed = ops.to_host(ops.add(dev, shifted))
    expect = [pts[0] + pts[1], pts[1] + pts[2], pts[2], pts[0]]
    for h, d in zip(expect, summed):
        assert (h.inf and d.inf) or (h.x == d.x and h.y == d.y)


@pytest.mark.parametrize("method", ["naive", "pippenger"])
def test_g2_msm_matches_host_oracle(method, monkeypatch):
    monkeypatch.setenv("LWT_MSM_HOST_MAX", "0")  # force the device path
    tw = bn254_twist()
    g = tw.generator()
    rng = random.Random(11)
    n = 11
    points = [g.mul(rng.randrange(1, 50)) for _ in range(n)]
    scalars = [rng.randrange(tw.order) for _ in range(n)]
    expected = msm_g2_naive_host(scalars, points)
    got = msm(tw, scalars, points, method=method)
    assert got.x == expected.x and got.y == expected.y
    assert got.inf == expected.inf


def test_g2_msm_bls12_381(monkeypatch):
    monkeypatch.setenv("LWT_MSM_HOST_MAX", "0")  # force the device path
    tw = bls12_381_twist()
    g = tw.generator()
    rng = random.Random(13)
    points = [g.mul(k + 1) for k in range(8)]
    scalars = [rng.randrange(1 << 64) for _ in range(8)]
    expected = msm_g2_naive_host(scalars, points)
    got = msm(tw, scalars, points)
    assert got.x == expected.x and got.y == expected.y
