"""Stone-prover byte compatibility, recorded case 2 (VERDICT r3 item 9).

Reproduces the reference's second recorded Stone vector family
(``provers/stark/src/prover.rs:1605`` proof_parts_stone_compatibility_case_2):
the 512-row shifted-Fibonacci trace seeded with 12345, blowup 2^6, one FRI
query, transcript seed fa fa fa ee.  Deep FRI (8 layers opened) pins the
serializer and transcript against drift far beyond case 1's 4-row trace.
"""

import pytest

from lambda_elliptic_curves_tpu.fiat_shamir.stone import StoneProverTranscript
from lambda_elliptic_curves_tpu.fields import Stark252
from lambda_elliptic_curves_tpu.provers.stark import prover as stark_prover
from lambda_elliptic_curves_tpu.provers.stark import verifier as stark_verifier
from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci_2_cols_shifted import (
    Fibonacci2ColsShiftedAIR, Fibonacci2ColsShiftedPublicInputs, compute_trace,
)
from lambda_elliptic_curves_tpu.provers.stark.options import ProofOptions
from lambda_elliptic_curves_tpu.provers.stark.stone_serializer import (
    get_fri_query_indexes,
)

pytestmark = pytest.mark.nightly

SEED = bytes([0xFA, 0xFA, 0xFA, 0xEE])


def _claimed_value(index: int) -> int:
    # col0 of compute_trace(field, 12345, 512) at the claimed index
    p = Stark252.p
    x, y = 1, 12345
    for _ in range(index):
        x, y = y, (x + y) % p
    return x


@pytest.fixture(scope="module")
def case_2():
    trace = compute_trace(Stark252, 12345, 512)
    pub = Fibonacci2ColsShiftedPublicInputs(
        claimed_value=_claimed_value(420), claimed_index=420)
    options = ProofOptions(blowup_factor=64, fri_number_of_queries=1,
                           coset_offset=3, grinding_factor=0)
    proof = stark_prover.prove(
        Fibonacci2ColsShiftedAIR, trace, pub, options,
        StoneProverTranscript(SEED),
    )
    return proof, pub, options


def test_case_2_proof_is_valid(case_2):
    proof, pub, options = case_2
    assert stark_verifier.verify(Fibonacci2ColsShiftedAIR, proof, pub,
                                 options, StoneProverTranscript(SEED))


def test_case_2_trace_commitment(case_2):
    # prover.rs:1659 stone_compatibility_case_2_trace_commitment
    proof, _, _ = case_2
    assert proof.lde_trace_main_merkle_root.hex() == (
        "6d31dd00038974bde5fe0c5e3a765f8ddc822a5df3254fca85a1950ae0208cbe"
    )


def test_case_2_fri_query_iota(case_2):
    # prover.rs:1669 stone_compatibility_case_2_fri_query_iota_challenge
    proof, pub, options = case_2
    iotas = get_fri_query_indexes(Fibonacci2ColsShiftedAIR, proof, pub,
                                  options, SEED)
    assert iotas[0] == 4239


def test_case_2_fri_layer_7_evaluation_symmetric(case_2):
    # prover.rs:1675 ..._fri_query_phase_layer_7_evaluation_symmetric
    proof, _, _ = case_2
    val = proof.query_list[0].layers_evaluations_sym[7]
    assert int(val) == int(
        "7aa40c5a4e30b44fee5bcc47c54072a435aa35c1a31b805cad8126118cc6860", 16
    )


def test_case_2_fri_layer_7_auth_path_level_5(case_2):
    # prover.rs:1687 ..._fri_query_phase_layer_8_authentication_path
    proof, _, _ = case_2
    node = proof.query_list[0].layers_auth_paths[7].merkle_path[5]
    assert node.hex() == (
        "f12f159b548ca2c571a270870d43e7ec2ead78b3e93b635738c31eb9bcda3dda"
    )
