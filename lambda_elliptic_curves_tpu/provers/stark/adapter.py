"""Foreign-AIR adapter (parity role: ``provers/winterfell_adapter/``).

The reference wraps winterfell ``Air`` implementations so the platinum
prover can prove winterfell traces.  The TPU-native equivalent is a small
duck-typing adapter: any object exposing the foreign surface

* ``trace_columns`` / ``trace_length``
* ``transition_offsets``
* ``evaluate_transition(frame_rows) -> list of values``  (frame_rows is a
  list of rows, one per offset, each a list of column values)
* ``boundary_assertions() -> [(column, step, value)]``
* optionally ``periodic_values()``, ``composition_degree_bound()``

is wrapped into a native :class:`AIR` and proved/verified with the standard
pipeline.  ``evaluate_transition`` receives *opaque values* supporting
+, -, * — on the prover path these are thin wrappers over batched device
arrays, on the verifier path host field elements, so a foreign AIR written
against plain arithmetic works unchanged on both.

Scope note (design-equivalent, not a link-level adapter): the reference
links the actual winterfell crates and adapts their ``Air`` trait objects
(``provers/winterfell_adapter/src/adapter/air.rs:30``); a Python build
cannot link Rust crates, so this module reproduces the adapter's *role* —
foreign AIR in, platinum proof out — against the same trait surface, and
``fields/winterfell_compat.py`` + the example AIRs in
``tests/test_winterfell_compat.py`` carry the behavioural parity tests.
"""

from __future__ import annotations

from .air import AIR, BoundaryConstraint, TransitionConstraint


class _CtxValue:
    """Arithmetic wrapper dispatching to an evaluation context."""

    __slots__ = ("ctx", "raw")

    def __init__(self, ctx, raw):
        self.ctx = ctx
        self.raw = raw

    def _lift(self, other):
        if isinstance(other, _CtxValue):
            return other.raw
        return self.ctx.constant(other)

    def __add__(self, other):
        return _CtxValue(self.ctx, self.ctx.add(self.raw, self._lift(other)))

    __radd__ = __add__

    def __sub__(self, other):
        return _CtxValue(self.ctx, self.ctx.sub(self.raw, self._lift(other)))

    def __rsub__(self, other):
        return _CtxValue(self.ctx, self.ctx.sub(self._lift(other), self.raw))

    def __mul__(self, other):
        return _CtxValue(self.ctx, self.ctx.mul(self.raw, self._lift(other)))

    __rmul__ = __mul__

    def __neg__(self):
        return _CtxValue(self.ctx, self.ctx.neg(self.raw))


class _AdapterConstraint(TransitionConstraint):
    def __init__(self, idx, foreign, num_offsets, end_exemptions):
        self.constraint_idx = idx
        self.foreign = foreign
        self.num_offsets = num_offsets
        self.end_exemptions = end_exemptions

    def evaluate(self, ctx, frame, periodic_values, rap_challenges):
        rows = [
            [_CtxValue(ctx, frame.get(o, c))
             for c in range(self.foreign.trace_columns)]
            for o in range(self.num_offsets)
        ]
        if getattr(self.foreign, "uses_periodic_values", False):
            pv = [_CtxValue(ctx, v) for v in periodic_values]
            out = self.foreign.evaluate_transition(rows, pv)
        else:
            out = self.foreign.evaluate_transition(rows)
        value = out[self.constraint_idx]
        return value.raw if isinstance(value, _CtxValue) else value


class AirAdapter(AIR):
    """Wraps a foreign AIR object (``winterfell_adapter/src/adapter/air.rs:30``
    role)."""

    @classmethod
    def for_foreign(cls, foreign, field):
        offsets = list(getattr(foreign, "transition_offsets", [0, 1]))
        n_constraints = foreign.num_transition_constraints

        class BoundAdapter(cls):
            pass

        BoundAdapter.field = field
        BoundAdapter.trace_columns = foreign.trace_columns
        BoundAdapter.transition_offsets = offsets
        BoundAdapter._foreign = foreign
        return BoundAdapter

    def __init__(self, trace_length, pub_inputs, proof_options):
        super().__init__(trace_length, pub_inputs, proof_options)
        foreign = self._foreign
        exemptions = getattr(foreign, "end_exemptions", len(self.transition_offsets) - 1)
        self._constraints = [
            _AdapterConstraint(i, foreign, len(self.transition_offsets),
                               exemptions)
            for i in range(foreign.num_transition_constraints)
        ]

    def transition_constraints(self):
        return self._constraints

    def boundary_constraints(self, rap_challenges):
        return [
            BoundaryConstraint(col=c, step=s, value=v)
            for (c, s, v) in self._foreign.boundary_assertions()
        ]

    def composition_poly_degree_bound(self):
        bound = getattr(self._foreign, "composition_degree_bound", None)
        return bound() if callable(bound) else (bound or 2 * self.trace_length)

    def get_periodic_column_values(self):
        pv = getattr(self._foreign, "periodic_values", None)
        return pv() if callable(pv) else []
