"""End-to-end STARK prove/verify (parity with
``provers/stark/src/tests/integration_tests.rs`` test_prove_fib).
"""

import pytest

from lambda_elliptic_curves_tpu.fields import Stark252, U64TestField
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.provers.stark import (
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
    FibonacciPublicInputs, fibonacci_air_for, fibonacci_trace,
)


@pytest.mark.parametrize("field", [U64TestField], ids=lambda f: f.name)
def test_prove_and_verify_fibonacci(field):
    air_cls = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    assert verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_verify_rejects_wrong_public_inputs():
    field = U64TestField
    air_cls = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    bad = FibonacciPublicInputs(a0=2, a1=1)
    assert not verify(air_cls, proof, bad, options, DefaultTranscript(field))


def test_verify_rejects_tampered_proof():
    field = U64TestField
    air_cls = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    proof.fri_last_value = (proof.fri_last_value + 1) % field.p
    assert not verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_prove_and_verify_larger_trace_stark252():
    """Larger-trace smoke over the production field: 256-row Stark252
    fibonacci at blowup 4 (the suite's other STARK e2es stay at 8-16
    rows; the bench covers 2^10+ without verification)."""
    field = Stark252
    air_cls = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 256)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions(blowup_factor=4, fri_number_of_queries=4,
                           coset_offset=3, grinding_factor=0)
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    assert verify(air_cls, proof, pub, options, DefaultTranscript(field))
    proof.fri_last_value = (proof.fri_last_value + 1) % field.p
    assert not verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_prove_and_verify_rap_larger_trace():
    """RAP e2e beyond toy size: 64-row permutation argument."""
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci_rap import (
        FibonacciRAP, FibonacciRAPPublicInputs, fibonacci_rap_trace,
    )

    field = Stark252

    class Bound(FibonacciRAP):
        def __init__(self, trace_length, pub_inputs, proof_options):
            super().__init__(trace_length, pub_inputs, proof_options,
                             field=field)

    trace = fibonacci_rap_trace(field, [1, 1], 64)
    pub = FibonacciRAPPublicInputs(steps=64)
    options = ProofOptions.default_test_options()
    proof = prove(Bound, trace, pub, options, DefaultTranscript(field))
    assert verify(Bound, proof, pub, options, DefaultTranscript(field))


def test_prove_with_grinding():
    field = U64TestField
    air_cls = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions(blowup_factor=4, fri_number_of_queries=2,
                           coset_offset=3, grinding_factor=4)
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    assert proof.nonce is not None
    assert verify(air_cls, proof, pub, options, DefaultTranscript(field))
