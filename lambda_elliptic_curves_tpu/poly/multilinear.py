"""Multilinear polynomials (parity: ``math/src/polynomial/
dense_multilinear_poly.rs`` and ``sparse_multilinear_poly.rs``).

TPU-native design: the dense polynomial keeps its hypercube evaluations as
a device digit array; ``fix_variable`` (the sumcheck workhorse) is one
halving vector op ``lo + r*(hi - lo)`` over the whole table, and full-point
evaluation is log-depth variable folding — no per-index loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.element import FieldElement


class DenseMultilinearPolynomial:
    """Evaluations over the boolean hypercube in Lagrange basis.

    Index convention matches the reference: variables are fixed from the
    FIRST variable, which selects between the low half (x1=0) and high half
    (x1=1) of the evaluation table.
    """

    def __init__(self, field, evals):
        self.field = field
        if hasattr(evals, "shape"):
            arr = evals
        else:
            vals = [v.value if isinstance(v, FieldElement) else int(v)
                    for v in evals]
            target = max(1, 1 << (len(vals) - 1).bit_length()) \
                if len(vals) > 1 else 1
            vals = vals + [0] * (target - len(vals))
            arr = field.array(vals)
        self.evals = arr

    def __len__(self):
        return self.evals.shape[-1]

    @property
    def num_vars(self):
        return (len(self) - 1).bit_length()

    def to_list(self):
        return [self.field(int(v)) for v in self.field.to_ints(self.evals)]

    def fix_variable(self, r) -> "DenseMultilinearPolynomial":
        """Bind the first variable to r: out = lo + r*(hi - lo)
        (``dense_multilinear_poly.rs`` fix_variable)."""
        f = self.field
        n = len(self) // 2
        lo = self.evals[..., :n]
        hi = self.evals[..., n:]
        r_arr = f.constant(int(r), (n,))
        out = f.add(lo, f.mul(r_arr, f.sub(hi, lo)))
        return DenseMultilinearPolynomial(f, out)

    def evaluate(self, point) -> FieldElement:
        """Evaluate at a full point (list of FieldElements/ints)."""
        poly = self
        for r in point:
            poly = poly.fix_variable(r)
        return self.field(int(self.field.to_ints(poly.evals[..., 0])))

    def evaluate_with(self, evals, point):
        return DenseMultilinearPolynomial(self.field, evals).evaluate(point)

    def add(self, other):
        return DenseMultilinearPolynomial(
            self.field, self.field.add(self.evals, other.evals))

    def mul_scalar(self, scalar):
        c = self.field.constant(int(scalar), (len(self),))
        return DenseMultilinearPolynomial(
            self.field, self.field.mul(self.evals, c))

    def __add__(self, other):
        return self.add(other)

    def __mul__(self, scalar):
        return self.mul_scalar(scalar)

    def sum_over_hypercube(self) -> FieldElement:
        from .polynomial import field_sum

        return self.field(int(self.field.to_ints(
            field_sum(self.field, self.evals, axis=-1))))


class SparseMultilinearPolynomial:
    """(index, value) evaluations; everything else is zero
    (parity: ``sparse_multilinear_poly.rs``)."""

    def __init__(self, field, num_vars: int, entries):
        self.field = field
        self.num_vars = num_vars
        self.entries = [(int(i), field(v) if not isinstance(v, FieldElement)
                         else v) for i, v in entries]

    def evaluate(self, point) -> FieldElement:
        """sum_i v_i * chi_i(point), chi the Lagrange basis on the cube."""
        f = self.field
        total = f(0)
        for idx, val in self.entries:
            term = val
            for b in range(self.num_vars):
                bit = (idx >> (self.num_vars - 1 - b)) & 1
                x = point[b] if isinstance(point[b], FieldElement) else f(point[b])
                term = term * (x if bit else (f(1) - x))
            total = total + term
        return total
