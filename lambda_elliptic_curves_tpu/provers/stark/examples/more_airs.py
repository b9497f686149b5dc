"""More example AIRs (parity: ``provers/stark/src/examples/``):
fibonacci_2_columns, quadratic_air, simple_periodic_cols.
"""

from __future__ import annotations

import dataclasses

from ..air import AIR, BoundaryConstraint, TransitionConstraint
from ..trace import TraceTable


# --------------------------- fibonacci, 2 columns ---------------------------
# x_{n+1} = y_n;  y_{n+1} = x_n + y_n  (fibonacci_2_columns.rs)

class Fib2ColsConstraint1(TransitionConstraint):
    constraint_idx = 0
    end_exemptions = 1

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        x_n = frame.get(0, 0)
        y_n = frame.get(0, 1)
        x_n1 = frame.get(1, 0)
        return ctx.sub(x_n1, ctx.add(x_n, y_n))


class Fib2ColsConstraint2(TransitionConstraint):
    constraint_idx = 1
    end_exemptions = 1

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        x_n = frame.get(0, 0)
        y_n = frame.get(0, 1)
        x_n1 = frame.get(1, 0)
        y_n1 = frame.get(1, 1)
        return ctx.sub(y_n1, ctx.add(x_n1, y_n))


@dataclasses.dataclass
class Fib2PublicInputs:
    a0: int = 1
    a1: int = 1


class Fibonacci2ColsAIR(AIR):
    trace_columns = 2
    transition_offsets = [0, 1]

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [Fib2ColsConstraint1(), Fib2ColsConstraint2()]

    def transition_constraints(self):
        return self._constraints

    def boundary_constraints(self, rap_challenges):
        return [
            BoundaryConstraint(col=0, step=0, value=self.pub_inputs.a0),
            BoundaryConstraint(col=1, step=0, value=self.pub_inputs.a1),
        ]

    def composition_poly_degree_bound(self):
        return self.trace_length


def fibonacci_2_cols_trace(field, initial_values, trace_length):
    x, y = int(initial_values[0]), int(initial_values[1])
    xs, ys = [x], [y]
    for _ in range(1, trace_length):
        nx = (xs[-1] + ys[-1]) % field.p
        ny = (nx + ys[-1]) % field.p
        xs.append(nx)
        ys.append(ny)
    return TraceTable.from_columns(field, [xs, ys])


# ------------------------------- quadratic AIR -------------------------------
# x_{n+1} = x_n^2 (quadratic_air.rs)

class QuadraticConstraint(TransitionConstraint):
    constraint_idx = 0
    end_exemptions = 1

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        x = frame.get(0, 0)
        x1 = frame.get(1, 0)
        return ctx.sub(x1, ctx.mul(x, x))


@dataclasses.dataclass
class QuadraticPublicInputs:
    a0: int = 3


class QuadraticAIR(AIR):
    trace_columns = 1
    transition_offsets = [0, 1]

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [QuadraticConstraint()]

    def transition_constraints(self):
        return self._constraints

    def boundary_constraints(self, rap_challenges):
        return [BoundaryConstraint(col=0, step=0, value=self.pub_inputs.a0)]

    def composition_poly_degree_bound(self):
        return 2 * self.trace_length


def quadratic_trace(field, a0, trace_length):
    col = [int(a0) % field.p]
    for _ in range(1, trace_length):
        col.append(col[-1] * col[-1] % field.p)
    return TraceTable.from_columns(field, [col])


# --------------------------- simple periodic columns ---------------------------
# s * (a2 - a1 - a0) with periodic s = [0, 1] (simple_periodic_cols.rs)

class PeriodicConstraint(TransitionConstraint):
    constraint_idx = 0
    end_exemptions = 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        a0 = frame.get(0, 0)
        a1 = frame.get(1, 0)
        a2 = frame.get(2, 0)
        s = periodic_values[0]
        return ctx.mul(s, ctx.sub(ctx.sub(a2, a1), a0))


@dataclasses.dataclass
class SimplePeriodicPublicInputs:
    a0: int = 1
    a1: int = 1


class SimplePeriodicAIR(AIR):
    trace_columns = 1
    transition_offsets = [0, 1, 2]

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [PeriodicConstraint()]

    def transition_constraints(self):
        return self._constraints

    def get_periodic_column_values(self):
        return [[0, 1]]

    def boundary_constraints(self, rap_challenges):
        return [
            BoundaryConstraint(col=0, step=0, value=self.pub_inputs.a0),
            BoundaryConstraint(col=0, step=1, value=self.pub_inputs.a1),
        ]

    def composition_poly_degree_bound(self):
        return 2 * self.trace_length


def simple_periodic_trace(field, trace_length):
    """C1: 1 1 1 2 2 4 4 8 ... — the sum constraint fires only at odd rows
    (where the periodic column is 1)."""
    col = [1, 1]
    for i in range(trace_length - 2):
        if i % 2 == 1:
            col.append((col[-1] + col[-2]) % field.p)
        else:
            col.append(col[-1])
    return TraceTable.from_columns(field, [col])
