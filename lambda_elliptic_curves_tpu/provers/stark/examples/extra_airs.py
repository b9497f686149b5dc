"""The remaining reference example AIRs: dummy_air, bit_flags and
read-only-memory (parity: ``provers/stark/src/examples/{dummy_air.rs,
bit_flags.rs, read_only_memory.rs}``).

TPU-style notes:
* ``BitFlagsAIR`` expresses the reference's STEP_SIZE=16 layout at row
  granularity: within-step rows become transition offsets ([0, 1, 15]) and
  the step structure lives purely in the zerofiers (period /
  exemptions_period = 16), which our cyclic-tiled zerofier evaluator
  handles natively — no step-strided frame machinery needed.
* ``ReadOnlyRAP`` is the multiset (permutation) memory argument from the
  Cairo whitepaper §9.7.2: 4 main columns (a, v, a', v') plus one aux
  grand-ratio column committed after the (z, alpha) challenges.
"""

from __future__ import annotations

import dataclasses

from ..air import AIR, BoundaryConstraint, TransitionConstraint
from ..trace import TraceTable


# ---------------------------------------------------------------------------
# dummy_air (``dummy_air.rs``): fibonacci on column 1, bit check on column 0
# ---------------------------------------------------------------------------

class _DummyFibConstraint(TransitionConstraint):
    constraint_idx = 0
    end_exemptions = 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        a0 = frame.get(0, 1)
        a1 = frame.get(1, 1)
        a2 = frame.get(2, 1)
        return ctx.sub(ctx.sub(a2, a1), a0)


class _DummyBitConstraint(TransitionConstraint):
    constraint_idx = 1
    end_exemptions = 0

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        bit = frame.get(0, 0)
        return ctx.mul(bit, ctx.sub(bit, ctx.one()))


class DummyAIR(AIR):
    """Two constraints of different degree over two columns."""

    trace_columns = 2
    transition_offsets = [0, 1, 2]

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [_DummyFibConstraint(), _DummyBitConstraint()]

    def transition_constraints(self):
        return self._constraints

    def boundary_constraints(self, rap_challenges):
        return [
            BoundaryConstraint(col=1, step=0, value=1),
            BoundaryConstraint(col=1, step=1, value=1),
        ]

    def composition_poly_degree_bound(self):
        return 2 * self.trace_length


def dummy_air_for(field):
    class BoundDummyAIR(DummyAIR):
        pass

    BoundDummyAIR.field = field
    return BoundDummyAIR


def dummy_trace(field, trace_length):
    """Column 0 all ones; column 1 the fibonacci sequence
    (``dummy_air.rs:213``)."""
    fib = [1, 1]
    for _ in range(2, trace_length):
        fib.append((fib[-1] + fib[-2]) % field.p)
    return TraceTable.from_columns(field, [[1] * trace_length, fib])


# ---------------------------------------------------------------------------
# bit_flags (``bit_flags.rs``): 16-row steps of bit-prefix flags
# ---------------------------------------------------------------------------

class _BitPrefixConstraint(TransitionConstraint):
    """flag_i - 2*flag_{i+1} is a bit, except on the last row of each
    16-row step (periodic exemption)."""

    constraint_idx = 0
    end_exemptions = 0
    exemptions_period = 16
    periodic_exemptions_offset = 15

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        flag = frame.get(0, 0)
        next_flag = frame.get(1, 0)
        two = ctx.constant(2)
        bit = ctx.sub(flag, ctx.mul(two, next_flag))
        return ctx.mul(bit, ctx.sub(bit, ctx.one()))


class _ZeroFlagConstraint(TransitionConstraint):
    """Row 15 of each step must hold zero (period-16 zerofier)."""

    constraint_idx = 1
    end_exemptions = 0
    period = 16
    offset = 0

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        return frame.get(2, 0)  # offsets[2] == 15: row 15 of the step


class BitFlagsAIR(AIR):
    trace_columns = 2
    transition_offsets = [0, 1, 15]

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [_BitPrefixConstraint(), _ZeroFlagConstraint()]

    def transition_constraints(self):
        return self._constraints

    def boundary_constraints(self, rap_challenges):
        return []

    def composition_poly_degree_bound(self):
        return 2 * self.trace_length


def bit_flags_air_for(field):
    class BoundBitFlagsAIR(BitFlagsAIR):
        pass

    BoundBitFlagsAIR.field = field
    return BoundBitFlagsAIR


def bit_prefix_flag_trace(field, num_steps: int):
    """num_steps repetitions of the 16-row flag pattern
    (``bit_flags.rs:201``), first entry patched to 1030 so the first
    prefix difference is the bit 0; plus a dummy 0..15 ramp column."""
    step = [1031, 515, 257, 128, 64, 32, 16, 8, 4, 2, 1, 0, 0, 0, 0, 0]
    data = step * num_steps
    data[0] = 1030
    dummy = list(range(16)) * num_steps
    return TraceTable.from_columns(field, [data, dummy])


# ---------------------------------------------------------------------------
# read_only_memory (``read_only_memory.rs``): sorted-memory multiset RAP
# ---------------------------------------------------------------------------

class _ContinuityConstraint(TransitionConstraint):
    """(a'_{i+1} - a'_i)(a'_{i+1} - a'_i - 1) = 0: sorted addresses are
    continuous (Cairo whitepaper 9.7.2)."""

    constraint_idx = 0
    end_exemptions = 1

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        a0 = frame.get(0, 2)
        a1 = frame.get(1, 2)
        d = ctx.sub(a1, a0)
        return ctx.mul(d, ctx.sub(d, ctx.one()))


class _SingleValueConstraint(TransitionConstraint):
    """(v'_{i+1} - v'_i)(a'_{i+1} - a'_i - 1) = 0: equal addresses carry
    equal values (read-only memory)."""

    constraint_idx = 1
    end_exemptions = 1

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        a0 = frame.get(0, 2)
        a1 = frame.get(1, 2)
        v0 = frame.get(0, 3)
        v1 = frame.get(1, 3)
        return ctx.mul(ctx.sub(v1, v0),
                       ctx.sub(ctx.sub(a1, a0), ctx.one()))


class _MemPermutationConstraint(TransitionConstraint):
    """(z - (a'_{i+1} + alpha v'_{i+1})) p_{i+1} =
    (z - (a_{i+1} + alpha v_{i+1})) p_i — the grand-ratio multiset
    argument."""

    constraint_idx = 2
    end_exemptions = 1

    def degree(self):
        return 2

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        z = ctx.constant(rap_challenges[0])
        alpha = ctx.constant(rap_challenges[1])
        p0 = frame.get(0, 4)   # aux column appended after the 4 main ones
        p1 = frame.get(1, 4)
        a1 = frame.get(1, 0)
        v1 = frame.get(1, 1)
        s_a1 = frame.get(1, 2)
        s_v1 = frame.get(1, 3)
        lhs = ctx.mul(ctx.sub(z, ctx.add(s_a1, ctx.mul(alpha, s_v1))), p1)
        rhs = ctx.mul(ctx.sub(z, ctx.add(a1, ctx.mul(alpha, v1))), p0)
        return ctx.sub(lhs, rhs)


@dataclasses.dataclass
class ReadOnlyPublicInputs:
    a0: int
    v0: int
    a_sorted0: int
    v_sorted0: int


class ReadOnlyRAP(AIR):
    """4 main columns (a, v, a_sorted, v_sorted) + 1 aux grand-ratio
    column committed after the (z, alpha) challenges
    (``read_only_memory.rs:221``)."""

    trace_columns = 4
    aux_columns = 1
    transition_offsets = [0, 1]
    has_trace_interaction = True

    def __init__(self, trace_length, pub_inputs, proof_options, field=None):
        super().__init__(trace_length, pub_inputs, proof_options)
        if field is not None:
            self.field = field
        self._constraints = [
            _ContinuityConstraint(),
            _SingleValueConstraint(),
            _MemPermutationConstraint(),
        ]

    def transition_constraints(self):
        return self._constraints

    def build_rap_challenges(self, transcript):
        return [self.sample_challenge(transcript),
                self.sample_challenge(transcript)]

    def build_auxiliary_trace(self, trace, rap_challenges):
        E = self.challenge_host_field()
        z, alpha = rap_challenges[0], rap_challenges[1]
        a, v, sa, sv = trace.to_host_columns()[:4]
        col = []
        acc = E(1)
        for i in range(trace.num_rows):
            num = z - (E(a[i]) + alpha * E(v[i]))
            den = z - (E(sa[i]) + alpha * E(sv[i]))
            acc = acc * num / den
            col.append(acc)
        return self.aux_array([col])

    def boundary_constraints(self, rap_challenges):
        E = self.challenge_host_field()
        pi = self.pub_inputs
        z, alpha = rap_challenges[0], rap_challenges[1]
        num = z - (E(pi.a0) + alpha * E(pi.v0))
        den = z - (E(pi.a_sorted0) + alpha * E(pi.v_sorted0))
        p0 = (num / den).value
        return [
            BoundaryConstraint(col=0, step=0, value=pi.a0),
            BoundaryConstraint(col=1, step=0, value=pi.v0),
            BoundaryConstraint(col=2, step=0, value=pi.a_sorted0),
            BoundaryConstraint(col=3, step=0, value=pi.v_sorted0),
            BoundaryConstraint(col=0, step=0, value=p0, is_aux=True),
            BoundaryConstraint(col=0, step=self.trace_length - 1, value=1,
                               is_aux=True),
        ]

    def composition_poly_degree_bound(self):
        return 2 * self.trace_length


def read_only_memory_air_for(field):
    class BoundReadOnlyRAP(ReadOnlyRAP):
        pass

    BoundReadOnlyRAP.field = field
    return BoundReadOnlyRAP


def sort_rap_trace(field, addresses, values):
    """(a, v) -> 4-column main trace (a, v, a_sorted, v_sorted)
    (``read_only_memory.rs:383``)."""
    p = field.p
    a = [int(x) % p for x in addresses]
    v = [int(x) % p for x in values]
    order = sorted(range(len(a)), key=lambda i: a[i])
    sa = [a[i] for i in order]
    sv = [v[i] for i in order]
    return TraceTable.from_columns(field, [a, v, sa, sv])
