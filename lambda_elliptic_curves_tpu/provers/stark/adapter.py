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


class FeltTranscript:
    """Winterfell-field transcript — mirror of ``FeltTranscript``
    (``winterfell_adapter/src/adapter/mod.rs:10``): incremental Keccak256
    state; field samples draw the FIRST 8 state bytes as a big-endian u64
    with rejection-resampling (appending the rejected bytes) until the
    draw lands below the Goldilocks modulus; ``sample_u64`` reduces the
    same 8 bytes mod the bound WITHOUT mutating the state."""

    def __init__(self, init_bytes: bytes = b"", field=None):
        from ...fields.winterfell_compat import WinterfellFelt

        self.field = field or WinterfellFelt
        self._buffer = b""
        if init_bytes:
            self.append_bytes(init_bytes)

    def append_bytes(self, new_bytes: bytes):
        self._buffer += bytes(new_bytes)

    def append_field_element(self, element):
        value = element.value if hasattr(element, "value") else int(element)
        self.append_bytes(int(value).to_bytes(8, "big"))

    def state(self) -> bytes:
        from ...hashes.keccak import keccak256

        return keccak256(self._buffer)

    def sample_field_element(self):
        while True:
            chunk = self.state()[:8]
            x = int.from_bytes(chunk, "big")
            if x < self.field.p:
                return self.field(x)
            self.append_bytes(chunk)

    def sample_u64(self, upper_bound: int) -> int:
        return int.from_bytes(self.state()[:8], "big") % int(upper_bound)

    def sample_z_ood(self, lde_coset_offset, lde_size: int,
                     trace_root_order: int):
        while True:
            z = self.sample_field_element()
            if ((z ** lde_size) != self.field(lde_coset_offset) ** lde_size
                    and (z ** (1 << trace_root_order)) != self.field(1)):
                return z


class QuadFeltTranscript(FeltTranscript):
    """Quadratic-extension transcript — mirror of ``QuadFeltTranscript``
    (``adapter/mod.rs:53``): delegates byte state to the Felt transcript;
    a field sample is TWO base samples combined as x + y*phi, and appends
    write both components big-endian."""

    def __init__(self, init_bytes: bytes = b""):
        from ...fields.winterfell_compat import QuadFelt

        super().__init__(init_bytes)
        self.quad = QuadFelt

    def append_field_element(self, element):
        value = element.value if hasattr(element, "value") else element
        if isinstance(value, tuple):
            for c in value:
                self.append_bytes(int(c).to_bytes(8, "big"))
        else:
            self.append_bytes(int(value).to_bytes(8, "big"))

    def sample_field_element(self):
        x = super().sample_field_element()
        y = super().sample_field_element()
        return self.quad((x.value, y.value))


def trace_from_columns(field, columns, step_size: int = 1):
    """``FromColumns`` role (``adapter/air.rs:19``): foreign column
    vectors (lists of ints or value-carrying elements) -> a native
    :class:`TraceTable`, ready for the platinum prover."""
    from .trace import TraceTable

    return TraceTable.from_columns(field, columns, step_size=step_size)


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
