"""Two-column shifted Fibonacci AIR (parity:
``provers/stark/src/examples/fibonacci_2_cols_shifted.rs``).

Columns (c0, c1) with c0' = c1 and c1' = c0 + c1 (so c1 is c0 shifted by
one); boundary: c0[0] = 1 and c0[claimed_index] = claimed_value.  This is
the AIR the reference's Stone-compatibility byte vectors are recorded
against (``prover.rs:proof_parts_stone_compatibility_case_1``).
"""

from __future__ import annotations

import dataclasses

from ....fields.zoo import Stark252
from ..air import AIR, BoundaryConstraint, TransitionConstraint
from ..trace import TraceTable


class _ShiftConstraint(TransitionConstraint):
    """c0(x g) - c1(x) = 0 (``ShiftedFibTransition1``)."""

    constraint_idx = 0
    end_exemptions = 1

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        return ctx.sub(frame.get(1, 0), frame.get(0, 1))


class _SumConstraint(TransitionConstraint):
    """c1(x g) - c0(x) - c1(x) = 0 (``ShiftedFibTransition2``)."""

    constraint_idx = 1
    end_exemptions = 1

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        return ctx.sub(ctx.sub(frame.get(1, 1), frame.get(0, 0)),
                       frame.get(0, 1))


@dataclasses.dataclass
class Fibonacci2ColsShiftedPublicInputs:
    claimed_value: int
    claimed_index: int

    def as_bytes(self) -> bytes:
        """``AsBytes`` parity: 8-byte BE index then 32-byte BE value."""
        return (self.claimed_index.to_bytes(8, "big")
                + int(self.claimed_value).to_bytes(32, "big"))


class Fibonacci2ColsShiftedAIR(AIR):
    field = Stark252
    trace_columns = 2
    transition_offsets = [0, 1]

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [_ShiftConstraint(), _SumConstraint()]

    def transition_constraints(self):
        return self._constraints

    def boundary_constraints(self, rap_challenges):
        return [
            BoundaryConstraint(col=0, step=0, value=1),
            BoundaryConstraint(col=0, step=self.pub_inputs.claimed_index,
                               value=self.pub_inputs.claimed_value),
        ]

    def composition_poly_degree_bound(self):
        return self.trace_length


def fibonacci_2_cols_shifted_air_for(field):
    class Bound(Fibonacci2ColsShiftedAIR):
        pass

    Bound.field = field
    return Bound


def compute_trace(field, initial_value, trace_length):
    """``compute_trace`` parity (``fibonacci_2_cols_shifted.rs:253``)."""
    x, y = 1, int(initial_value) % field.p
    col0, col1 = [x], [y]
    for _ in range(1, trace_length):
        x, y = y, (x + y) % field.p
        col0.append(x)
        col1.append(y)
    return TraceTable.from_columns(field, [col0, col1])
