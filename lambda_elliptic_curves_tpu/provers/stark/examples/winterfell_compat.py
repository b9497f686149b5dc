"""Faithful port of the winterfell-adapter example AIRs (parity:
``provers/winterfell_adapter/src/examples/{fibonacci_2_terms,cubic}.rs``),
driven through :class:`..adapter.AirAdapter`.

The originals are winterfell ``Air`` impls over the Miden ``Felt`` field
(Goldilocks, p = 2^64 - 2^32 + 1); here they are the same constraint
systems written against the adapter's opaque-value arithmetic, proved over
our :data:`~...fields.Goldilocks` — the winterfell-compatible field.
"""

from __future__ import annotations

from ....fields import Goldilocks
from ..adapter import AirAdapter
from ..trace import TraceTable


class FibAir2Terms:
    """``fibonacci_2_terms.rs``: two Fibonacci terms per step.

    Constraints (``evaluate_transition``):
        s0' = s0 + s1
        s1' = s1 + s0'
    Assertions (``get_assertions``): s0[0] = 1, s1[0] = 1,
    s1[last] = result.
    """

    trace_columns = 2
    num_transition_constraints = 2
    transition_offsets = [0, 1]

    def __init__(self, trace_length: int, result: int):
        self.trace_length = trace_length
        self.result = result

    def evaluate_transition(self, rows):
        current, nxt = rows
        return [
            nxt[0] - (current[0] + current[1]),
            nxt[1] - (current[1] + nxt[0]),
        ]

    def boundary_assertions(self):
        return [
            (0, 0, 1),
            (1, 0, 1),
            (1, self.trace_length - 1, self.result),
        ]


def _fib_2_terms_columns(sequence_length: int):
    assert sequence_length & (sequence_length - 1) == 0
    rows = sequence_length // 2
    p = Goldilocks.p
    s0, s1 = 1, 1
    col0, col1 = [], []
    for _ in range(rows):
        col0.append(s0)
        col1.append(s1)
        s0 = (s0 + s1) % p
        s1 = (s1 + s0) % p
    return col0, col1


def fib_2_terms_trace(sequence_length: int):
    """``build_trace`` parity: trace of ``sequence_length / 2`` rows, two
    terms per row."""
    return TraceTable.from_columns(
        Goldilocks, list(_fib_2_terms_columns(sequence_length)))


def fib_2_terms_air(sequence_length: int):
    """Adapter-wrapped AIR class + the matching trace."""
    _, col1 = _fib_2_terms_columns(sequence_length)
    foreign = FibAir2Terms(sequence_length // 2, col1[-1])
    return AirAdapter.for_foreign(foreign, Goldilocks), \
        fib_2_terms_trace(sequence_length)


class CubicAir:
    """``cubic.rs``: one column, next = current^3."""

    trace_columns = 1
    num_transition_constraints = 1
    transition_offsets = [0, 1]

    def __init__(self, start: int = 2):
        self.start = start

    def evaluate_transition(self, rows):
        cur = rows[0][0]
        nxt = rows[1][0]
        return [nxt - cur * cur * cur]

    def boundary_assertions(self):
        return [(0, 0, self.start)]


def cubic_trace(length: int, start: int = 2):
    p = Goldilocks.p
    vals, a = [], start
    for _ in range(length):
        vals.append(a)
        a = pow(a, 3, p)
    return TraceTable.from_columns(Goldilocks, [vals])
