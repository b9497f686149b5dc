"""G2: sextic-twist curves E'(Fp2) with batched device Jacobian kernels.

Parity: the reference's G2 story — ``ShortWeierstrassProjectivePoint`` over
the degree-2 extension (``bls12_381/twist.rs``, ``bn_254/twist.rs``) and
the fact that Pippenger MSM is generic over ``IsGroup``
(``math/src/msm/pippenger.rs:19``), so G2 MSMs (Groth16 pi_2,
``provers/groth16/src/prover.rs:68``) run the same bucket pipeline.

TPU-native design: a G2 point batch is a triple of **flat** Fp2 digit
arrays ``(2K, *batch)`` (:class:`DeviceQuadraticField` layout), so the
entire Jacobian group law, the segmented-scan bucket machinery, and the
Pippenger window pipeline from :mod:`.weierstrass` / :mod:`.msm` run
unchanged — the extension field is just twice the digits.
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields import zoo as FZ
from ..fields.extensions import DeviceQuadraticField, ExtensionField
from .pairings import (
    AffinePoint, BLS12377Pairing, BLS12381Pairing, BN254Pairing,
)
from .weierstrass import JacobianOps


@dataclasses.dataclass(frozen=True, eq=False)
class TwistCurve:
    """y^2 = x^3 + a x + b over Fp2; G2 = the order-r subgroup."""

    name: str
    field: DeviceQuadraticField
    host_field: ExtensionField
    a: tuple
    b: tuple
    gx: tuple
    gy: tuple
    order: int

    # lets :func:`..curves.msm.msm` pick the right ops without imports
    @property
    def jacobian_ops_class(self):
        return TwistJacobianOps

    def generator(self) -> AffinePoint:
        return AffinePoint(self.host_field, self.host_field(self.gx),
                           self.host_field(self.gy))

    def neutral(self) -> AffinePoint:
        return AffinePoint.infinity(self.host_field)

    def defining_equation(self, x, y) -> bool:
        f = self.host_field
        xe, ye = f(x), f(y)
        return ye * ye == xe * xe * xe + f(self.a) * xe + f(self.b)


class TwistJacobianOps(JacobianOps):
    """Batched Jacobian group law over flat Fp2 digit arrays.

    Inherits every kernel (double/add/select/reductions/bucket machinery)
    from :class:`JacobianOps` — only host<->device conversion and the
    curve-coefficient multiply differ.
    """

    def __init__(self, twist: TwistCurve):
        self.curve = twist
        self.f = twist.field

    def _mul_a(self, v):
        a = self.curve.a
        if not any(_flat_ints(a)):
            return self.f.zeros(v.shape[1:])
        return self.f.mul(self.f.constant(a, v.shape[1:]), v)

    def from_host(self, points):
        """List of host AffinePoints (over Fp2) -> (x, y, z) flat digit
        arrays (z = 0 encodes infinity)."""
        f = self.f
        xs, ys, zs = [], [], []
        for pt in points:
            if pt.inf:
                xs.append(1)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(pt.x.value)
                ys.append(pt.y.value)
                zs.append(1)
        return f.array(xs), f.array(ys), f.array(zs)

    def to_host(self, pt):
        """(x, y, z) flat digit arrays -> list of host AffinePoints."""
        f = self.f
        host = self.curve.host_field
        xs = f.to_tuples(pt[0])
        ys = f.to_tuples(pt[1])
        zs = f.to_tuples(pt[2])
        out = []
        for x, y, z in zip(xs, ys, zs):
            ze = host(z)
            if ze.is_zero():
                out.append(self.curve.neutral())
            else:
                zinv = ze.inv()
                zinv2 = zinv * zinv
                out.append(AffinePoint(
                    host, host(x) * zinv2, host(y) * zinv2 * zinv))
        return out


def _flat_ints(value):
    if isinstance(value, tuple):
        for v in value:
            yield from _flat_ints(v)
    else:
        yield int(value)


# ---------------------------------------------------------------------------
# concrete twists (generators shared with the pairing configs)
# ---------------------------------------------------------------------------

@functools.cache
def bls12_381_twist() -> TwistCurve:
    cfg = BLS12381Pairing
    return TwistCurve(
        name="bls12_381_twist",
        field=DeviceQuadraticField(FZ.BLS12381Field, FZ.BLS12381Field.p - 1,
                                   name="bls12_381_fp2"),
        host_field=cfg.fp2,
        a=(0, 0), b=cfg.twist_b,
        gx=cfg.g2_x, gy=cfg.g2_y,
        order=FZ.BLS12_381_ORDER,
    )


@functools.cache
def bn254_twist() -> TwistCurve:
    cfg = BN254Pairing
    return TwistCurve(
        name="bn254_twist",
        field=DeviceQuadraticField(FZ.BN254Field, FZ.BN254Field.p - 1,
                                   name="bn254_fp2"),
        host_field=cfg.fp2,
        a=(0, 0), b=cfg.twist_b,
        gx=cfg.g2_x, gy=cfg.g2_y,
        order=FZ.BN254_ORDER,
    )


@functools.cache
def bls12_377_twist() -> TwistCurve:
    cfg = BLS12377Pairing
    return TwistCurve(
        name="bls12_377_twist",
        field=DeviceQuadraticField(FZ.BLS12377Field, FZ.BLS12377Field.p - 5,
                                   name="bls12_377_fp2"),
        host_field=cfg.fp2,
        a=(0, 0), b=cfg.twist_b,
        gx=cfg.g2_x, gy=cfg.g2_y,
        order=FZ.BLS12_377_ORDER,
    )


def msm_g2_naive_host(scalars, points):
    """Exact host G2 MSM oracle (affine double-and-add over Fp2)."""
    if not points:
        raise ValueError("empty MSM")
    acc = AffinePoint.infinity(points[0].field)
    for s, pt in zip(scalars, points):
        acc = acc + pt.mul(int(s))
    return acc
