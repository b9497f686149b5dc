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
