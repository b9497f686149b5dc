"""Fibonacci RAP (randomized AIR with preprocessing).

Parity: ``provers/stark/src/examples/fibonacci_rap.rs`` — two main columns
(the sequence and a permuted copy) and one auxiliary column accumulating
the grand product z_{i+1} = z_i * (a_i + gamma)/(a'_i + gamma), with the
permutation challenge gamma sampled after the main-trace commitment.
Exercises the two-phase RAP commitment path (``traits.rs:88,97``).
"""

from __future__ import annotations

import dataclasses

from ..air import AIR, BoundaryConstraint, TransitionConstraint
from ..trace import TraceTable


class FibRapFibConstraint(TransitionConstraint):
    constraint_idx = 0

    def __init__(self, end_exemptions):
        self.end_exemptions = end_exemptions

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        a0 = frame.get(0, 0)
        a1 = frame.get(1, 0)
        a2 = frame.get(2, 0)
        return ctx.sub(ctx.sub(a2, a1), a0)


class FibRapPermutationConstraint(TransitionConstraint):
    constraint_idx = 1
    end_exemptions = 1

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        # aux column is appended after the 2 main columns
        z_i = frame.get(0, 2)
        z_i1 = frame.get(1, 2)
        a_i = frame.get(0, 0)
        b_i = frame.get(0, 1)
        gamma = ctx.constant(rap_challenges[0])
        lhs = ctx.mul(z_i1, ctx.add(b_i, gamma))
        rhs = ctx.mul(z_i, ctx.add(a_i, gamma))
        return ctx.sub(lhs, rhs)


@dataclasses.dataclass
class FibonacciRAPPublicInputs:
    steps: int
    a0: int = 1
    a1: int = 1


class FibonacciRAP(AIR):
    trace_columns = 2
    aux_columns = 1
    transition_offsets = [0, 1, 2]
    has_trace_interaction = True

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        exemptions = 3 + trace_length - pub_inputs.steps - 1
        self._constraints = [
            FibRapFibConstraint(exemptions),
            FibRapPermutationConstraint(),
        ]

    def transition_constraints(self):
        return self._constraints

    def build_rap_challenges(self, transcript):
        # sampled in the challenge field E when an extension is active
        # (``traits.rs:97`` takes the FieldExtension transcript)
        return [self.sample_challenge(transcript)]

    def build_auxiliary_trace(self, trace, rap_challenges):
        E = self.challenge_host_field()
        gamma = rap_challenges[0]
        cols = trace.to_host_columns()
        not_perm, perm = cols[0], cols[1]
        z = [E(1)]
        for i in range(1, trace.num_rows):
            num = E(not_perm[i - 1]) + gamma
            den = E(perm[i - 1]) + gamma
            z.append(z[-1] * num / den)
        return self.aux_array([z])

    def boundary_constraints(self, rap_challenges):
        return [
            BoundaryConstraint(col=0, step=0, value=self.pub_inputs.a0),
            BoundaryConstraint(col=0, step=1, value=self.pub_inputs.a1),
            BoundaryConstraint(col=0, step=0, value=1, is_aux=True),
        ]

    def composition_poly_degree_bound(self):
        return self.trace_length


def fibonacci_rap_trace(field, initial_values, trace_length):
    """Sequence + permuted copy (first/last swapped), zero-appended and
    padded to a power of two (``fibonacci_rap.rs:285``)."""
    p = field.p
    fib = [int(initial_values[0]) % p, int(initial_values[1]) % p]
    for _ in range(2, trace_length):
        fib.append((fib[-1] + fib[-2]) % p)
    perm = list(fib)
    perm[0], perm[-1] = fib[-1], fib[0]
    fib.append(0)
    perm.append(0)
    target = 1 << (len(fib) - 1).bit_length()
    fib += [0] * (target - len(fib))
    perm += [0] * (target - len(perm))
    return TraceTable.from_columns(field, [fib, perm])
