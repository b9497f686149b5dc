"""Stone-prover byte-level compatibility of the full STARK pipeline.

Reproduces the reference's recorded Stone vectors
(``provers/stark/src/prover.rs: stone_compatibility_case_1_*``): proving the
two-column shifted Fibonacci AIR with the exact Stone configuration must
yield the same commitments, challenges, openings and authentication-path
bytes, and the Stone proof serializer must emit them in the Stone layout.
"""

import pytest

from lambda_elliptic_curves_tpu.fiat_shamir.stone import StoneProverTranscript
from lambda_elliptic_curves_tpu.provers.stark import prover as stark_prover
from lambda_elliptic_curves_tpu.provers.stark import verifier as stark_verifier
from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci_2_cols_shifted import (
    Fibonacci2ColsShiftedAIR, Fibonacci2ColsShiftedPublicInputs, compute_trace,
)
from lambda_elliptic_curves_tpu.provers.stark.options import ProofOptions
from lambda_elliptic_curves_tpu.provers.stark.stone_serializer import (
    get_fri_query_indexes, serialize_proof_stone,
)
from lambda_elliptic_curves_tpu.fields import Stark252

pytestmark = pytest.mark.nightly  # compile-heavy tier


SEED = bytes([0xCA, 0xFE, 0xCA, 0xFE])


@pytest.fixture(scope="module")
def case_1():
    trace = compute_trace(Stark252, 1, 4)
    pub = Fibonacci2ColsShiftedPublicInputs(claimed_value=3, claimed_index=3)
    options = ProofOptions(blowup_factor=4, fri_number_of_queries=1,
                           coset_offset=3, grinding_factor=0)
    proof = stark_prover.prove(
        Fibonacci2ColsShiftedAIR, trace, pub, options,
        StoneProverTranscript(SEED),
    )
    return proof, pub, options


def test_case_1_proof_is_valid(case_1):
    proof, pub, options = case_1
    assert stark_verifier.verify(Fibonacci2ColsShiftedAIR, proof, pub,
                                 options, StoneProverTranscript(SEED))


def test_case_1_trace_commitment(case_1):
    proof, _, _ = case_1
    assert proof.lde_trace_main_merkle_root.hex() == (
        "0eb9dcc0fb1854572a01236753ce05139d392aa3aeafe72abff150fe21175594"
    )


def test_case_1_composition_poly_commitment(case_1):
    proof, _, _ = case_1
    assert proof.composition_poly_root.hex() == (
        "7cdd8d5fe3bd62254a417e2e260e0fed4fccdb6c9005e828446f645879394f38"
    )


def test_case_1_ood_evaluations(case_1):
    proof, _, _ = case_1
    rows = proof.trace_ood_evaluations
    assert rows[0][0] == int(
        "70d8181785336cc7e0a0a1078a79ee6541ca0803ed3ff716de5a13c41684037", 16)
    assert rows[1][0] == int(
        "29808fc8b7480a69295e4b61600480ae574ca55f8d118100940501b789c1630", 16)
    assert rows[0][1] == int(
        "7d8110f21d1543324cc5e472ab82037eaad785707f8cae3d64c5b9034f0abd2", 16)
    assert rows[1][1] == int(
        "1b58470130218c122f71399bf1e04cf75a6e8556c4751629d5ce8c02cc4e62d", 16)
    assert proof.composition_poly_parts_ood_evaluation[0] == int(
        "1c0b7c2275e36d62dfb48c791be122169dcc00c616c63f8efb2c2a504687e85", 16)


def test_case_1_fri_phase(case_1):
    proof, _, _ = case_1
    assert proof.fri_layers_merkle_roots[0].hex() == (
        "327d47da86f5961ee012b2b0e412de16023ffba97c82bfe85102f00daabd49fb"
    )
    assert proof.fri_last_value == int(
        "43fedf9f9e3d1469309862065c7d7ca0e7e9ce451906e9c01553056f695aec9", 16)
    assert proof.query_list[0].layers_evaluations_sym[0] == int(
        "0684991e76e5c08db17f33ea7840596be876d92c143f863e77cad10548289fd0", 16)
    path = proof.query_list[0].layers_auth_paths[0].merkle_path
    assert path[0].hex() == (
        "0683622478e9e93cc2d18754872f043619f030b494d7ec8e003b1cbafe83b67b")
    assert path[1].hex() == (
        "7985d945abe659a7502698051ec739508ed6bab594984c7f25e095a0a57a2e55")


def test_case_1_deep_openings(case_1):
    proof, _, _ = case_1
    opening = proof.deep_poly_openings[0]
    assert opening.main_trace_polys.evaluations[0] == int(
        "4de0d56f9cf97dff326c26592fbd4ae9ee756080b12c51cfe4864e9b8734f43", 16)
    assert opening.main_trace_polys.evaluations[1] == int(
        "1bc1aadf39f2faee64d84cb25f7a95d3dceac1016258a39fc90c9d370e69e8e", 16)
    assert opening.main_trace_polys.evaluations_sym[0] == int(
        "321f2a9063068310cd93d9a6d042b516118a9f7f4ed3ae301b79b16478cb0c6", 16)
    assert opening.main_trace_polys.evaluations_sym[1] == int(
        "643e5520c60d06219b27b34da0856a2c23153efe9da75c6036f362c8f196186", 16)
    assert opening.composition_poly.evaluations[0] == int(
        "2b54852557db698e97253e9d110d60e9bf09f1d358b4c1a96f9f3cf9d2e8755", 16)
    assert opening.composition_poly.evaluations_sym[0] == int(
        "190f1b0acb7858bd3f5285b68befcf32b436a5f1e3a280e1f42565c1f35c2c3", 16)


def test_case_1_iota_and_serialized_proof(case_1):
    proof, pub, options = case_1
    iotas = get_fri_query_indexes(Fibonacci2ColsShiftedAIR, proof, pub,
                                  options, SEED)
    assert iotas == [1]

    data = serialize_proof_stone(Fibonacci2ColsShiftedAIR, proof, pub,
                                 options, SEED)
    # layout walk-through for this shape: main root | composition root |
    # 4 trace OOD + 1 part OOD | 1 fri root | last value | BT_1 (4 values) |
    # merged trace paths | BH_1 (2 values) | merged composition paths |
    # Z_1 + merged layer paths
    def wire(v):  # AsBytes parity: Montgomery-form bytes
        return Stark252(int(v)).as_bytes()

    assert data[0:32] == proof.lde_trace_main_merkle_root
    assert data[32:64] == proof.composition_poly_root
    ood = proof.trace_ood_evaluations
    assert data[64:96] == wire(ood[0][0])
    assert data[96:128] == wire(ood[1][0])
    assert data[128:160] == wire(ood[0][1])
    assert data[160:192] == wire(ood[1][1])
    assert data[192:224] == wire(proof.composition_poly_parts_ood_evaluation[0])
    assert data[224:256] == proof.fri_layers_merkle_roots[0]
    assert data[256:288] == wire(proof.fri_last_value)
    # no nonce (grinding 0): next is BT_1
    opening = proof.deep_poly_openings[0]
    assert data[288:320] == wire(opening.main_trace_polys.evaluations[0])
    from lambda_elliptic_curves_tpu.provers.stark.stone_serializer import (
        merge_authentication_paths,
    )

    n_trace_path = len(merge_authentication_paths(
        [opening.main_trace_polys.proof, opening.main_trace_polys.proof_sym],
        [2, 3],
    ))
    n_comp_path = len(merge_authentication_paths(
        [opening.composition_poly.proof], [1]))
    layer_paths = proof.query_list[0].layers_auth_paths
    index = 1
    layer_nodes = 0
    for path in layer_paths:
        index >>= 1
        layer_nodes += len(merge_authentication_paths([path], [index]))
    expected = (
        2 * 32                       # roots
        + 5 * 32                     # OOD
        + 1 * 32 + 32                # fri root + last value
        + 4 * 32                     # BT_1
        + n_trace_path * 32          # merged trace paths
        + 2 * 32                     # BH_1
        + n_comp_path * 32           # merged composition paths
        + len(layer_paths) * 32      # Z_i, one element per layer
        + layer_nodes * 32           # merged layer paths
    )
    assert len(data) == expected
