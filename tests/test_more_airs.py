"""Quadratic + simple-periodic example AIRs e2e and validate_trace
(parity: ``provers/stark/src/examples/{quadratic_air,simple_periodic_cols}
.rs`` integration tests and ``debug.rs:14``)."""

from lambda_elliptic_curves_tpu.fields import Stark252, U64TestField
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.provers.stark import (
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.debug import validate_trace
from lambda_elliptic_curves_tpu.provers.stark.examples.more_airs import (
    QuadraticAIR, QuadraticPublicInputs, SimplePeriodicAIR,
    SimplePeriodicPublicInputs, quadratic_trace, simple_periodic_trace,
)


def _bind(air_base, field):
    class Bound(air_base):
        def __init__(self, trace_length, pub_inputs, proof_options):
            super().__init__(trace_length, pub_inputs, proof_options,
                             field=field)

    return Bound


def test_quadratic_air_prove_verify():
    f = Stark252
    air_cls = _bind(QuadraticAIR, f)
    trace = quadratic_trace(f, 3, 16)
    pub = QuadraticPublicInputs(a0=3)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(f))
    assert verify(air_cls, proof, pub, options, DefaultTranscript(f))
    # wrong starting value rejected
    bad = QuadraticPublicInputs(a0=4)
    assert not verify(air_cls, proof, bad, options, DefaultTranscript(f))


def test_simple_periodic_air_prove_verify():
    f = Stark252
    air_cls = _bind(SimplePeriodicAIR, f)
    trace = simple_periodic_trace(f, 16)
    pub = SimplePeriodicPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(f))
    assert verify(air_cls, proof, pub, options, DefaultTranscript(f))


def test_validate_trace_accepts_valid_traces():
    f = U64TestField
    air_cls = _bind(QuadraticAIR, f)
    trace = quadratic_trace(f, 3, 8)
    air = air_cls(8, QuadraticPublicInputs(a0=3),
                  ProofOptions.default_test_options())
    assert validate_trace(air, trace) == []


def test_validate_trace_pinpoints_violations():
    f = U64TestField
    air_cls = _bind(QuadraticAIR, f)
    # corrupt one interior step: a[3] != a[2]^2
    col = list(quadratic_trace(f, 3, 8).to_host_columns()[0])
    col[3] = (col[3] + 1) % f.p
    from lambda_elliptic_curves_tpu.provers.stark.trace import TraceTable

    bad_trace = TraceTable.from_columns(f, [col])
    air = air_cls(8, QuadraticPublicInputs(a0=3),
                  ProofOptions.default_test_options())
    violations = validate_trace(air, bad_trace)
    assert violations, "corrupted trace must be reported"
    assert any("row" in v for v in violations)
