"""Prover-side trace validation (parity: ``provers/stark/src/debug.rs:14``,
``validate_trace``): re-evaluate every transition and boundary constraint
over the raw trace and report violations.  Run it before proving while
developing an AIR — it pinpoints the failing constraint and row."""

from __future__ import annotations


def validate_trace(air, trace, rap_challenges=None) -> list:
    """Returns a list of human-readable violation strings (empty = valid)."""
    from .air import HostCtx, Frame

    f = air.field
    rap_challenges = rap_challenges or []
    cols = trace.to_host_columns()
    if trace.aux is not None:
        aux_ints = f.to_ints(trace.aux)
        cols = cols + [[int(v) for v in c] for c in aux_ints]
    n = trace.num_rows
    violations = []

    # periodic columns cycled over the trace
    periodic = []
    for values in air.get_periodic_column_values():
        vals = [int(v) for v in values]
        periodic.append([vals[i % len(vals)] for i in range(n)])

    ctx = HostCtx(f)
    offsets = air.transition_offsets
    for row in range(n):
        exempt_rows = max(o for o in offsets)
        frame = Frame(lambda off_idx, col, row=row: f(
            cols[col][(row + offsets[off_idx] * air.step_size) % n]
        ))
        per_vals = [f(p[row]) for p in periodic]
        evaluations = air.compute_transition(ctx, frame, per_vals,
                                             rap_challenges)
        for c in air.transition_constraints():
            ev = evaluations[c.constraint_idx]
            # rows in the exemption window are not constrained
            end_limit = n - c.end_exemptions * c.period
            if row >= end_limit or row % c.period != c.offset % c.period:
                continue
            if not ev.is_zero():
                violations.append(
                    f"transition constraint {c.constraint_idx} failed at "
                    f"row {row}: {ev!r}"
                )

    for bc in air.boundary_constraints(rap_challenges):
        col = bc.col + (air.trace_columns if bc.is_aux else 0)
        value = bc.value.value if hasattr(bc.value, "value") else int(bc.value)
        got = cols[col][bc.step]
        if got % f.p != value % f.p:
            violations.append(
                f"boundary constraint col={bc.col} step={bc.step} failed: "
                f"expected {value:#x}, got {got:#x}"
            )
    return violations
