"""Foreign-AIR adapter end-to-end (winterfell-adapter parity role:
``provers/winterfell_adapter/src/adapter/air.rs``): a duck-typed AIR
written against plain +,-,* arithmetic is wrapped and proved/verified
with the native pipeline — mirroring the reference's cubic example."""

from lambda_elliptic_curves_tpu.fields import U64TestField as F
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.provers.stark import (
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.adapter import AirAdapter
from lambda_elliptic_curves_tpu.provers.stark.trace import TraceTable


class ForeignCubicAir:
    """next = current^3, one column — written against opaque values."""

    trace_columns = 1
    num_transition_constraints = 1
    transition_offsets = [0, 1]

    def evaluate_transition(self, rows):
        cur = rows[0][0]
        nxt = rows[1][0]
        return [nxt - cur * cur * cur]

    def boundary_assertions(self):
        return [(0, 0, 2)]


def _cubic_trace(length):
    vals, a = [], 2
    for _ in range(length):
        vals.append(a)
        a = pow(a, 3, F.p)
    return TraceTable.from_columns(F, [vals])


def test_adapter_prove_and_verify():
    air_cls = AirAdapter.for_foreign(ForeignCubicAir(), F)
    trace = _cubic_trace(8)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(F))
    assert verify(air_cls, proof, None, options, DefaultTranscript(F))


def test_adapter_rejects_bad_trace():
    air_cls = AirAdapter.for_foreign(ForeignCubicAir(), F)
    vals = [2, 8, 512, 99, 1, 1, 1, 1]  # breaks the cubic relation
    trace = TraceTable.from_columns(F, [vals])
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(F))
    assert not verify(air_cls, proof, None, options, DefaultTranscript(F))
