"""Standard cosets of circle subgroups (parity: ``math/src/circle/cosets.rs``)."""

from __future__ import annotations

import dataclasses

from .point import CirclePoint


@dataclasses.dataclass
class Coset:
    log_2_size: int
    shift: CirclePoint

    @classmethod
    def new_standard(cls, log_2_size: int) -> "Coset":
        """g_2n + <g_n>."""
        return cls(log_2_size,
                   CirclePoint.get_generator_of_subgroup(log_2_size + 1))

    def get_generator(self) -> CirclePoint:
        return CirclePoint.generator().repeated_double(31 - self.log_2_size)

    @staticmethod
    def half_coset(coset: "Coset") -> "Coset":
        return Coset(coset.log_2_size - 1, coset.shift)

    @staticmethod
    def conjugate(coset: "Coset") -> "Coset":
        return Coset(coset.log_2_size, coset.shift.conjugate())

    def points(self) -> list:
        g = CirclePoint.get_generator_of_subgroup(self.log_2_size)
        out = []
        acc = self.shift
        for _ in range(1 << self.log_2_size):
            out.append(acc)
            acc = acc + g
        return out
