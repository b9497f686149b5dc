"""Plonk circuit frontend: constraint system, operations, witness solver.

Parity: ``provers/plonk/src/constraint_system/`` — gates enforce
``a*Q_L + b*Q_R + a*b*Q_M + c*Q_O + Q_C = 0`` (``mod.rs:12``), the public
input header places one ``ql = -1`` row per public variable (:120),
``to_matrices`` lays out LRO/Q column-major with padding (:158),
``get_permutation`` is the two-pass last-usage cycle construction (:214),
and the solver (``solver.rs``) is iterative constraint propagation with
single-input hints.
"""

from __future__ import annotations

import dataclasses

from ...fields.element import FieldElement


L, R, O = "l", "r", "o"


@dataclasses.dataclass
class Hint:
    function: object  # FieldElement -> FieldElement
    input: str  # column
    output: str


@dataclasses.dataclass
class Constraint:
    ql: object
    qr: object
    qm: object
    qo: object
    qc: object
    l: int
    r: int
    o: int
    hint: Hint = None


class ConstraintSystem:
    def __init__(self, field):
        self.field = field
        self.num_variables = 0
        self.public_input_variables = []
        self.constraints = []
        self.null_variable()  # variable 0 is the null placeholder

    # -- variables ---------------------------------------------------------
    def null_variable(self) -> int:
        if self.num_variables == 0:
            self.num_variables = 1
        return 0

    def new_variable(self) -> int:
        var = self.num_variables
        self.num_variables += 1
        return var

    def new_public_input(self) -> int:
        var = self.new_variable()
        self.public_input_variables.append(var)
        return var

    # -- raw constraints ------------------------------------------------------
    def add_constraint(self, ql, qr, qm, qo, qc, l, r, o, hint=None):
        f = self.field
        self.constraints.append(Constraint(
            ql=f(ql), qr=f(qr), qm=f(qm), qo=f(qo), qc=f(qc),
            l=l, r=r, o=o, hint=hint,
        ))

    # -- operations (operations.rs / conditional.rs / types.rs parity) ------
    def add(self, a: int, b: int) -> int:
        c = self.new_variable()
        self.add_constraint(1, 1, 0, -1, 0, a, b, c)
        return c

    def sub(self, a: int, b: int) -> int:
        c = self.new_variable()
        self.add_constraint(1, -1, 0, -1, 0, a, b, c)
        return c

    def mul(self, a: int, b: int) -> int:
        c = self.new_variable()
        self.add_constraint(0, 0, 1, -1, 0, a, b, c)
        return c

    def div(self, a: int, b: int) -> int:
        """c with c*b = a (solver derives c)."""
        c = self.new_variable()
        # l=b, r=c, o=a:  b*c - a = 0
        self.add_constraint(0, 0, 1, -1, 0, b, c, a)
        return c

    def add_constant(self, a: int, constant) -> int:
        c = self.new_variable()
        self.add_constraint(1, 0, 0, -1, constant, a, self.null_variable(), c)
        return c

    def mul_constant(self, a: int, constant) -> int:
        c = self.new_variable()
        self.add_constraint(constant, 0, 0, -1, 0, a, self.null_variable(), c)
        return c

    def linear_combination(self, variables, coefficients, constant=0):
        """Fold c = sum coeff_i * v_i + constant."""
        acc = None
        for v, k in zip(variables, coefficients):
            term = self.mul_constant(v, k)
            acc = term if acc is None else self.add(acc, term)
        if constant:
            acc = self.add_constant(acc, constant)
        return acc

    def new_boolean(self) -> int:
        b = self.new_variable()
        self.assert_boolean(b)
        return b

    def assert_boolean(self, b: int):
        # b*b - b = 0
        self.add_constraint(-1, 0, 1, 0, 0, b, b, self.null_variable())

    def not_(self, b: int) -> int:
        c = self.new_variable()
        # b + c - 1 = 0
        self.add_constraint(1, 1, 0, 0, -1, b, c, self.null_variable())
        return c

    def inv(self, v: int) -> int:
        """w = v^-1, enforced by v*w = 1 and hinted for the solver."""
        w = self.new_variable()
        hint = Hint(function=lambda x: x.inv(), input=L, output=R)
        self.add_constraint(0, 0, 1, 0, -1, v, w, self.null_variable(),
                            hint=hint)
        return w

    def assert_eq(self, a: int, b: int):
        self.add_constraint(1, -1, 0, 0, 0, a, b, self.null_variable())

    def if_else(self, boolean: int, v1: int, v2: int) -> int:
        """boolean*v1 + (1-boolean)*v2 (conditional.rs role)."""
        t1 = self.mul(boolean, v1)
        nb = self.not_(boolean)
        t2 = self.mul(nb, v2)
        return self.add(t1, t2)

    def if_nz(self, v: int, v1: int, v2: int) -> int:
        """if v != 0 then v1 else v2 — via inverse trick b = v * v^-1."""
        w = self.inv(v)
        b = self.mul(v, w)
        return self.if_else(b, v1, v2)

    def new_u32(self) -> tuple:
        """A 32-bit unsigned value as its bit decomposition
        (types.rs ``new_u32``): returns (value_var, [bit_vars] msb-first)."""
        bits = [self.new_boolean() for _ in range(32)]
        value = self.linear_combination(
            bits, [1 << (31 - i) for i in range(32)]
        )
        return value, bits

    # -- matrices / permutation ------------------------------------------------
    def _padding_constraint(self):
        z = self.field(0)
        return Constraint(ql=z, qr=z, qm=z, qo=z, qc=z,
                          l=0, r=0, o=0)

    def _public_input_header(self):
        rows = []
        for v in self.public_input_variables:
            rows.append(Constraint(
                ql=-self.field(1), qr=self.field(0), qm=self.field(0),
                qo=self.field(0), qc=self.field(0),
                l=v, r=0, o=0,
            ))
        return rows

    def full_constraints(self):
        header = self._public_input_header()
        total = len(header) + len(self.constraints)
        padded = 1 << (total - 1).bit_length() if total > 1 else 1
        return header + self.constraints + [
            self._padding_constraint() for _ in range(padded - total)
        ]

    def to_matrices(self):
        """(lro, q): lro = l||r||o variable ids; q = ql||qr||qm||qo||qc."""
        full = self.full_constraints()
        n = len(full)
        lro = [0] * (3 * n)
        q = [self.field(0)] * (5 * n)
        for i, c in enumerate(full):
            lro[i], lro[i + n], lro[i + 2 * n] = c.l, c.r, c.o
            q[i], q[i + n] = c.ql, c.qr
            q[i + 2 * n], q[i + 3 * n], q[i + 4 * n] = c.qm, c.qo, c.qc
        return lro, q

    def public_input_values(self, assignments):
        return [assignments[v] for v in self.public_input_variables
                if v in assignments]

    # -- solver (solver.rs parity) -------------------------------------------
    def solve(self, assignments: dict) -> dict:
        f = self.field
        assignments = dict(assignments)
        # the dedicated null placeholder variable always carries zero (it
        # only ever appears with zero coefficients, and the copy-constraint
        # cycles through it stay consistent)
        assignments.setdefault(0, f(0))

        def get(c, col):
            var = getattr(c, col)
            return assignments.get(var)

        progress = True
        while progress:
            before = len(assignments)
            for c in self.constraints:
                # hints first
                if c.hint is not None:
                    out_var = getattr(c, c.hint.output)
                    in_val = get(c, c.hint.input)
                    if out_var not in assignments and in_val is not None:
                        assignments[out_var] = c.hint.function(in_val)
                a, b, o = get(c, L), get(c, R), get(c, O)
                if a is not None and b is not None and o is None:
                    if not c.qo.is_zero():
                        assignments[c.o] = -(a * c.ql + b * c.qr
                                             + a * b * c.qm + c.qc) / c.qo
                elif a is not None and o is not None and b is None:
                    den = c.qr + a * c.qm
                    if not den.is_zero():
                        assignments[c.r] = -(a * c.ql + o * c.qo + c.qc) / den
                elif b is not None and o is not None and a is None:
                    den = c.ql + b * c.qm
                    if not den.is_zero():
                        assignments[c.l] = -(b * c.qr + o * c.qo + c.qc) / den
            progress = len(assignments) > before

        from ...utils.errors import ProvingError

        for c in self.constraints:
            a, b, o = get(c, L), get(c, R), get(c, O)
            if a is None or b is None or o is None:
                raise ProvingError("unable to solve the constraint system")
            if not (a * c.ql + b * c.qr + a * b * c.qm + o * c.qo + c.qc
                    ).is_zero():
                raise ProvingError("inconsistent constraint system")
        return assignments


def get_permutation(lro):
    """Two-pass last-usage cycles (``mod.rs:214``)."""
    last_usage = {}
    permutation = [0] * len(lro)
    for _ in range(2):
        for index, variable in enumerate(lro):
            if variable in last_usage:
                permutation[index] = last_usage[variable]
            last_usage[variable] = index
    return permutation
