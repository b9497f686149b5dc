"""Sharded STARK round 1 on the 8-way virtual CPU mesh: the sharded
trace-LDE + Merkle commit must reproduce the single-device prover's
main-tree root bit-for-bit (VERDICT r1 item 9)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252
from lambda_elliptic_curves_tpu.merkle import MerkleTree
from lambda_elliptic_curves_tpu.merkle.backends import KeccakBatchBackend
from lambda_elliptic_curves_tpu.parallel.stark_sharded import (
    sharded_commit, sharded_round1, sharded_trace_lde,
)
from lambda_elliptic_curves_tpu.poly import ntt

pytestmark = pytest.mark.nightly  # compile-heavy tier


@pytest.fixture
def mesh():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("x",))


def _trace(field, n_rows, n_cols):
    return field.array(
        [[(7 * r + c + 1) % field.p for r in range(n_rows)]
         for c in range(n_cols)])


@pytest.mark.parametrize("field", [Stark252, BabyBear], ids=lambda f: f.name)
def test_sharded_lde_matches_single_device(field, mesh):
    n, C, blowup = 64, 2, 4
    trace = _trace(field, n, C)
    # single-device reference path (the prover's round 1)
    tpolys = ntt.interpolate_fft(field, trace)
    lde = ntt.evaluate_offset_fft(field, tpolys, blowup, n, 3)
    want = ntt.bit_reverse_permute(lde)
    got = sharded_trace_lde(field, trace, mesh, blowup, 3)
    assert (field.to_ints(got) == field.to_ints(want)).all()


def test_sharded_commit_root_equals_single_device(mesh):
    field = Stark252
    n, C, blowup = 64, 3, 4
    trace = _trace(field, n, C)
    tpolys = ntt.interpolate_fft(field, trace)
    lde_br = ntt.bit_reverse_permute(
        ntt.evaluate_offset_fft(field, tpolys, blowup, n, 3))
    want_root = MerkleTree.build(KeccakBatchBackend(field), lde_br).root

    got_root, got_lde = sharded_round1(field, trace, mesh, blowup, 3)
    assert got_root == want_root
    assert (field.to_ints(got_lde) == field.to_ints(lde_br)).all()


def test_sharded_full_prove_bit_for_bit(mesh):
    """The ambient-mesh prover (ALL rounds sharded where sizes split) must
    produce byte-identical proofs to the single-device prover, and they
    must verify (VERDICT r3 item 5)."""
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
    from lambda_elliptic_curves_tpu.parallel.stark_sharded import (
        sharded_prove,
    )
    from lambda_elliptic_curves_tpu.provers.stark import (
        ProofOptions, prove, verify,
    )
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
        FibonacciPublicInputs, fibonacci_air_for, fibonacci_trace,
    )
    from lambda_elliptic_curves_tpu.utils.serialization import (
        serialize_proof,
    )

    field = Stark252
    air = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 64)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    opts = ProofOptions(blowup_factor=2, fri_number_of_queries=4,
                        coset_offset=3, grinding_factor=0)

    sharded = sharded_prove(air, trace, pub, opts,
                            DefaultTranscript(field), mesh)
    local = prove(air, trace, pub, opts, DefaultTranscript(field))
    assert serialize_proof(sharded) == serialize_proof(local)
    assert verify(air, sharded, pub, opts, DefaultTranscript(field))


def test_sharded_commit_proofs_open_against_root(mesh):
    """Openings from a single-device tree verify against the sharded root —
    i.e. the sharded commitment is interchangeable in the protocol."""
    field = Stark252
    n, C, blowup = 32, 2, 2
    trace = _trace(field, n, C)
    got_root, lde_br = sharded_round1(field, trace, mesh, blowup, 3)

    backend = KeccakBatchBackend(field)
    tree = MerkleTree.build(backend, lde_br)
    assert tree.root == got_root
    row = [int(v) for v in
           field.to_ints(lde_br[:, :, 5]).reshape(C)]
    proof = tree.get_proof_by_pos(5)
    assert proof.verify(backend, got_root, 5, row)
