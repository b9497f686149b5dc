"""Points on the unit circle x^2 + y^2 = 1 over Mersenne31.

Parity: ``math/src/circle/point.rs`` — the group law is
(a, b) + (c, d) = (ac - bd, ad + bc) (complex multiplication on the unit
circle), generator (2, 1268011823) of order 2^31.
"""

from __future__ import annotations

M31 = (1 << 31) - 1

CIRCLE_GENERATOR = (2, 1268011823)


class CirclePoint:
    __slots__ = ("x", "y")

    def __init__(self, x: int, y: int, check: bool = True):
        self.x, self.y = x % M31, y % M31
        if check and (self.x * self.x + self.y * self.y) % M31 != 1:
            from ..utils.errors import CreationError

            raise CreationError("point not on the circle")

    @classmethod
    def zero(cls):
        return cls(1, 0, check=False)

    @classmethod
    def generator(cls):
        return cls(*CIRCLE_GENERATOR, check=False)

    @classmethod
    def get_generator_of_subgroup(cls, log_2_size: int):
        return cls.generator().repeated_double(31 - log_2_size)

    def add(self, other: "CirclePoint") -> "CirclePoint":
        return CirclePoint(
            self.x * other.x - self.y * other.y,
            self.x * other.y + self.y * other.x,
            check=False,
        )

    __add__ = add

    def double(self) -> "CirclePoint":
        return CirclePoint(
            (2 * self.x * self.x - 1) % M31,
            (2 * self.x * self.y) % M31,
            check=False,
        )

    def repeated_double(self, n: int) -> "CirclePoint":
        pt = self
        for _ in range(n):
            pt = pt.double()
        return pt

    def conjugate(self) -> "CirclePoint":
        return CirclePoint(self.x, -self.y, check=False)

    def scalar_mul(self, k: int) -> "CirclePoint":
        acc = CirclePoint.zero()
        add = self
        while k:
            if k & 1:
                acc = acc + add
            add = add.double()
            k >>= 1
        return acc

    def __eq__(self, other):
        return self.x == other.x and self.y == other.y

    def __repr__(self):
        return f"CirclePoint({self.x}, {self.y})"
