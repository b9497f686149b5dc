"""Montgomery-model curves (parity: ``math/src/elliptic_curve/montgomery/``):
b y^2 = x^3 + a x^2 + x with affine chord/tangent addition, plus
TinyJubJub-Montgomery."""

from __future__ import annotations

import dataclasses

from ..fields.field import PrimeField
from ..fields.params import FieldParams
from ..utils.errors import CreationError


@dataclasses.dataclass(frozen=True)
class MontgomeryCurve:
    name: str
    field: PrimeField
    a: int
    b: int
    gx: int
    gy: int

    def defining_equation(self, x: int, y: int) -> int:
        p = self.field.p
        return (self.b * y * y - (x * x * x + self.a * x * x + x)) % p

    def generator(self):
        return MontgomeryPoint(self, self.gx, self.gy)

    def neutral(self):
        return MontgomeryPoint(self, 0, 1, infinity=True)

    def point(self, x, y):
        return MontgomeryPoint(self, int(x), int(y))


class MontgomeryPoint:
    __slots__ = ("curve", "x", "y", "infinity")

    def __init__(self, curve, x, y, infinity=False, check=True):
        p = curve.field.p
        self.curve, self.x, self.y = curve, x % p, y % p
        self.infinity = infinity
        if check and not infinity and curve.defining_equation(self.x, self.y) != 0:
            raise CreationError(f"({x}, {y}) not on {curve.name}")

    def is_neutral_element(self):
        return self.infinity

    def operate_with(self, other):
        if self.infinity:
            return other
        if other.infinity:
            return self
        curve = self.curve
        p = curve.field.p
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return curve.neutral()
            # tangent
            num = (3 * x1 * x1 + 2 * curve.a * x1 + 1) % p
            den = (2 * curve.b * y1) % p
        else:
            num = (y2 - y1) % p
            den = (x2 - x1) % p
        lam = num * pow(den, -1, p) % p
        x3 = (curve.b * lam * lam - curve.a - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return MontgomeryPoint(curve, x3, y3, check=False)

    __add__ = operate_with

    def double(self):
        return self.operate_with(self)

    def neg(self):
        return MontgomeryPoint(self.curve, self.x, -self.y,
                               infinity=self.infinity, check=False)

    __neg__ = neg

    def operate_with_self(self, times: int):
        acc = self.curve.neutral()
        add = self
        t = int(times)
        while t:
            if t & 1:
                acc = acc.operate_with(add)
            add = add.double()
            t >>= 1
        return acc

    __mul__ = operate_with_self
    __rmul__ = operate_with_self

    def __eq__(self, other):
        if self.infinity or other.infinity:
            return self.infinity == other.infinity
        return self.x == other.x and self.y == other.y


_F13 = PrimeField(FieldParams(name="f13_tiny_m", p=13))

TinyJubJubMontgomery = MontgomeryCurve(
    name="tiny_jub_jub_montgomery", field=_F13, a=6, b=7, gx=3, gy=5,
)
