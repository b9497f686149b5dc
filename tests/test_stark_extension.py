"""Extension-field STARK: challenges sampled in a tower over the trace
field (parity: ``provers/stark/src/traits.rs:75-80`` — ``Field:
IsFFTField + IsSubFieldOf<FieldExtension>`` — and the extension-sampled
OOD/DEEP/FRI challenges of ``prover.rs:487``).

Covers: ChallengeBundle unit behaviour (componentwise NTT, evaluation at
an extension point, base scaling) and full prove/verify round trips for
Goldilocks + Fp2 challenges and BabyBear + Fp4 challenges.
"""

import random

import pytest

from lambda_elliptic_curves_tpu.fields import BabyBear, Goldilocks
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.poly import ntt
from lambda_elliptic_curves_tpu.provers.stark import (
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
    FibonacciPublicInputs, fibonacci_air_for, fibonacci_trace,
)
from lambda_elliptic_curves_tpu.provers.stark.extension import ChallengeBundle


# ---------------------------------------------------------------------------
# ChallengeBundle unit tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("field,degree", [(Goldilocks, 2), (BabyBear, 4)],
                         ids=["goldilocks_fp2", "babybear_fp4"])
def test_bundle_host_device_roundtrip(field, degree):
    ext = ChallengeBundle(field, degree)
    rng = random.Random(7)
    elems = [ext.host(tuple_random(rng, field.p, degree)) for _ in range(5)]
    # flat components nest back to the same host value
    for e in elems:
        flat = ext.flat(e)
        assert len(flat) == degree
        assert ext.host(_nest(flat, degree)) == e
    # device constant -> host_value round trip
    for e in elems:
        arr = ext.fd.constant(e.value, (1,))
        assert ext.host(ext.host_value(arr)) == e


@pytest.mark.parametrize("field,degree", [(Goldilocks, 2), (BabyBear, 4)],
                         ids=["goldilocks_fp2", "babybear_fp4"])
def test_bundle_evaluate_base_coeffs_at_ext_point(field, degree):
    """evaluate_coeffs_at == Horner in the host tower."""
    ext = ChallengeBundle(field, degree)
    rng = random.Random(11)
    n = 8
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    z = ext.host(tuple_random(rng, field.p, degree))
    dev = ext.evaluate_coeffs_at(field.array(coeffs), z)
    got = ext.host(ext.host_value(dev))
    want = ext.host(0)
    for c in reversed(coeffs):
        want = want * z + ext.host(c)
    assert got == want


@pytest.mark.parametrize("field,degree", [(Goldilocks, 2), (BabyBear, 4)],
                         ids=["goldilocks_fp2", "babybear_fp4"])
def test_bundle_componentwise_ntt_roundtrip(field, degree):
    ext = ChallengeBundle(field, degree)
    rng = random.Random(13)
    n = 16
    vals = [tuple_random(rng, field.p, degree) for _ in range(n)]
    arr = ext.fd.array(vals)
    back = ext.interpolate_fft(
        ext.evaluate_offset_fft(arr, 1, None, 1))
    # evaluate on the plain domain (offset 1) then interpolate: identity
    assert ext.fd.to_tuples(back) == [ext.fd.to_tuples(arr)[i]
                                      for i in range(n)]


def test_bundle_scale_base_matches_host():
    field = Goldilocks
    ext = ChallengeBundle(field, 2)
    rng = random.Random(17)
    base_vals = [rng.randrange(field.p) for _ in range(6)]
    e = ext.host(tuple_random(rng, field.p, 2))
    out = ext.scale_base(field.array(base_vals), e)
    got = ext.fd.to_tuples(out)
    want = [(ext.host(v) * e).value for v in base_vals]
    assert got == want


def test_bundle_degree1_is_base_field():
    ext = ChallengeBundle(Goldilocks, 1)
    assert ext.fd is Goldilocks
    assert ext.host is Goldilocks
    assert ext.flat(Goldilocks(5)) == [5]


# ---------------------------------------------------------------------------
# end-to-end prove/verify with extension challenges
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("field,degree,length", [
    (Goldilocks, 2, 16),
    (BabyBear, 4, 8),
], ids=["goldilocks_fp2", "babybear_fp4"])
def test_prove_and_verify_fibonacci_extension(field, degree, length):
    air_cls = fibonacci_air_for(field, extension_degree=degree)
    trace = fibonacci_trace(field, [1, 1], length)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    # OOD values are genuine extension elements (soundness is 1/|E|)
    assert isinstance(proof.trace_ood_evaluations[0][0], tuple)
    assert isinstance(proof.fri_last_value, tuple)
    assert verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_extension_proof_rejects_tampering():
    field = Goldilocks
    air_cls = fibonacci_air_for(field, extension_degree=2)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    c0, c1 = proof.fri_last_value
    proof.fri_last_value = ((c0 + 1) % field.p, c1)
    assert not verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_extension_proof_rejects_wrong_public_inputs():
    field = Goldilocks
    air_cls = fibonacci_air_for(field, extension_degree=2)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    bad = FibonacciPublicInputs(a0=2, a1=1)
    assert not verify(air_cls, proof, bad, options, DefaultTranscript(field))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def tuple_random(rng, p, degree):
    if degree == 1:
        return rng.randrange(p)
    half = degree // 2
    return (tuple_random(rng, p, half), tuple_random(rng, p, half)) \
        if degree > 2 else (rng.randrange(p), rng.randrange(p))


def _nest(flat, degree):
    if degree == 1:
        return flat[0]
    half = degree // 2
    return (_nest(flat[:half], half), _nest(flat[half:], half))


def test_rap_with_extension_challenges():
    """RAP aux trace with Fp2 challenges: aux column lives in E
    (``traits.rs:88`` — build_auxiliary_trace over FieldExtension)."""
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci_rap import (
        FibonacciRAP, FibonacciRAPPublicInputs, fibonacci_rap_trace,
    )

    field = Goldilocks

    class FibRapExt(FibonacciRAP):
        extension_degree = 2

        def __init__(self, trace_length, pub_inputs, proof_options):
            super().__init__(trace_length, pub_inputs, proof_options,
                             field=field)

    trace = fibonacci_rap_trace(field, [1, 1], 16)
    pub = FibonacciRAPPublicInputs(steps=16)
    options = ProofOptions.default_test_options()
    proof = prove(FibRapExt, trace, pub, options, DefaultTranscript(field))
    assert isinstance(proof.trace_ood_evaluations[0][0], tuple)
    assert verify(FibRapExt, proof, pub, options, DefaultTranscript(field))
    # tampering with the aux commitment is caught
    proof.lde_trace_aux_merkle_root = bytes(
        b ^ 1 for b in proof.lde_trace_aux_merkle_root)
    assert not verify(FibRapExt, proof, pub, options,
                      DefaultTranscript(field))
