"""R1CS structures (parity: ``provers/groth16/src/r1cs.rs:19``)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class R1CS:
    """Constraint rows a·w * b·w = c·w; ``a/b/c`` are lists of rows, each a
    list of coefficients (ints) over the witness vector."""

    a: list
    b: list
    c: list
    number_of_inputs: int  # public inputs INCLUDING the leading 1

    @classmethod
    def from_matrices(cls, a, b, c, number_of_inputs):
        return cls([list(map(int, r)) for r in a],
                   [list(map(int, r)) for r in b],
                   [list(map(int, r)) for r in c],
                   number_of_inputs)

    @property
    def number_of_constraints(self) -> int:
        return len(self.a)

    @property
    def witness_size(self) -> int:
        return len(self.a[0])


@dataclasses.dataclass
class ConstraintSystem:
    constraints: R1CS
    witness: list
