"""Twisted Edwards curves (parity: ``math/src/elliptic_curve/edwards/``):
a x^2 + y^2 = 1 + d x^2 y^2 with the complete unified addition law, plus
the concrete curves Bandersnatch, Ed448-Goldilocks and TinyJubJub."""

from __future__ import annotations

import dataclasses

from ..fields import zoo as F
from ..fields.field import PrimeField
from ..fields.params import FieldParams
from ..utils.errors import CreationError


@dataclasses.dataclass(frozen=True)
class EdwardsCurve:
    name: str
    field: PrimeField
    a: int
    d: int
    gx: int
    gy: int

    def defining_equation(self, x: int, y: int) -> int:
        p = self.field.p
        return (self.a * x * x + y * y - 1 - self.d * x * x % p * y * y) % p

    def generator(self):
        return EdwardsPoint(self, self.gx, self.gy)

    def neutral(self):
        return EdwardsPoint(self, 0, 1, check=False)

    def point(self, x, y):
        return EdwardsPoint(self, int(x), int(y))


class EdwardsPoint:
    """Affine Edwards point; the unified law is complete for a != d."""

    __slots__ = ("curve", "x", "y")

    def __init__(self, curve, x, y, check=True):
        p = curve.field.p
        self.curve, self.x, self.y = curve, x % p, y % p
        if check and curve.defining_equation(self.x, self.y) != 0:
            raise CreationError(f"({x}, {y}) not on {curve.name}")

    def operate_with(self, other):
        p = self.curve.field.p
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        dxy = self.curve.d * x1 * x2 % p * y1 * y2 % p
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dxy, -1, p) % p
        y3 = (y1 * y2 - self.curve.a * x1 * x2) * pow(1 - dxy, -1, p) % p
        return EdwardsPoint(self.curve, x3, y3, check=False)

    __add__ = operate_with

    def double(self):
        return self.operate_with(self)

    def neg(self):
        return EdwardsPoint(self.curve, -self.x, self.y, check=False)

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

    def is_neutral_element(self):
        return self.x == 0 and self.y == 1

    def __eq__(self, other):
        return self.x == other.x and self.y == other.y

    def __repr__(self):
        return f"EdwardsPoint({hex(self.x)}, {hex(self.y)})"


BandersnatchCurve = EdwardsCurve(
    name="bandersnatch",
    field=F.BLS12381Fr,
    a=int("73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFEFFFFFFFC", 16),
    d=int("6389C12633C267CBC66E3BF86BE3B6D8CB66677177E54F92B369F2F5188D58E7", 16),
    gx=int("29C132CC2C0B34C5743711777BBE42F32B79C022AD998465E1E71866A252AE18", 16),
    gy=int("2A6C669EDA123E0F157D8B50BADCD586358CAD81EEE464605E3167B6CC974166", 16),
)

Ed448Goldilocks = EdwardsCurve(
    name="ed448_goldilocks",
    field=F.P448Goldilocks,
    a=1,
    d=(-39081) % F.P448_GOLDILOCKS_PRIME,
    gx=int(
        "4f1970c66bed0ded221d15a622bf36da9e146570470f1767ea6de324a3d3a464"
        "12ae1af72ab66511433b80e18b00938e2626a82bc70cc05e", 16),
    gy=int(
        "693f46716eb6bc248876203756c9c7624bea73736ca3984087789c1e05a0c2d7"
        "3ad3ff1ce67c39c4fdbd132c4ed7c8ad9808795bf230fa14", 16),
)

_F13 = PrimeField(FieldParams(name="f13_tiny", p=13))

TinyJubJubEdwards = EdwardsCurve(
    name="tiny_jub_jub_edwards", field=_F13, a=3, d=8, gx=8, gy=5,
)
