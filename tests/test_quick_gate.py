"""The `-m quick` commit gate: a < 2 minute cross-section of every layer.

Run before every commit (`python -m pytest -m quick -q`).  Each check is a
minimal end-to-end drive of one subsystem — the goal is catching wiring
regressions (broken imports, signature drift, protocol-order changes)
fast, not exhaustive coverage (the full suite owns that).

Parity role: the reference's default `cargo test` tier vs the slower
fuzz/bench jobs (``.github/workflows/ci.yaml``).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.quick


def test_field_roundtrip_and_inverse():
    from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252

    for f in (Stark252, BabyBear):
        vals = [1, 2, f.p - 1, 12345]
        arr = f.array(vals)
        assert [int(v) for v in f.to_ints(arr)] == [v % f.p for v in vals]
        inv = f.to_ints(f.inv(arr))
        assert all(int(i) * v % f.p == 1 for i, v in zip(inv, vals))


def test_ntt_roundtrip_and_point_check():
    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.poly import ntt

    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    c = f.array(coeffs)
    ev = ntt.fft(c, f)
    w = f.params.primitive_root_of_unity(3)
    for j in (0, 1, 5):
        want = sum(ci * pow(w, j * i, f.p) for i, ci in enumerate(coeffs)) % f.p
        assert int(f.to_ints(ev[..., j])) == want
    back = ntt.ifft(ev, f)
    assert [int(x) for x in f.to_ints(back)] == coeffs


def test_merkle_host_and_device_paths_agree():
    import os

    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.merkle import MerkleTree
    from lambda_elliptic_curves_tpu.merkle.backends import KeccakFieldBackend

    be = KeccakFieldBackend(f)
    leaves = f.array(list(range(1, 17)))
    t_host = MerkleTree.build(be, leaves)
    os.environ["LWT_MERKLE_HOST"] = "0"
    try:
        t_dev = MerkleTree.build(be, leaves)
    finally:
        os.environ.pop("LWT_MERKLE_HOST", None)
    assert t_host.root == t_dev.root
    pr = t_host.get_proof_by_pos(5)
    assert pr.verify(be, t_host.root, 5, 6)
    assert not pr.verify(be, t_host.root, 5, 7)


def test_transcript_kat():
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
    from lambda_elliptic_curves_tpu.fields import BLS12381Fr

    t = DefaultTranscript(BLS12381Fr)
    t.append_bytes(bytes([0xFF, 0xAB]))
    t.append_bytes(bytes([0xDD, 0x8C, 0x9D]))
    assert t.sample().hex() == (
        "0c2bd8cf2d71e00acea3bd5dc79f4f93ed5742d023bd47c904c2679dbcfa7ca7"
    )


def test_poseidon_kat():
    from lambda_elliptic_curves_tpu.hashes.poseidon import hash_host

    assert int(hash_host(0x123456, 0x789101)) == int(
        "0x2fb6e1e8838d4b850877944f0a13340dd5810f01f5d4361c54b22b4abda3248", 16
    )


def test_stark_verify_fixture_proof():
    """Verifier wiring gate on a stored proof (proving compiles for
    minutes on the 1-core box; the full suite owns prover round trips —
    the fixture regenerates via `python tests/fixtures/make_fib16.py`)."""
    import pathlib

    from lambda_elliptic_curves_tpu.fields import Stark252
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
    from lambda_elliptic_curves_tpu.provers.stark import ProofOptions, verify
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
        FibonacciPublicInputs, fibonacci_air_for,
    )
    from lambda_elliptic_curves_tpu.utils.serialization import (
        deserialize_proof,
    )

    f = Stark252
    blob = (pathlib.Path(__file__).parent / "fixtures"
            / "fib16_proof.bin").read_bytes()
    proof = deserialize_proof(blob)
    air_cls = fibonacci_air_for(f)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    opts = ProofOptions(blowup_factor=2, fri_number_of_queries=4,
                        coset_offset=3, grinding_factor=0)
    assert verify(air_cls, proof, pub, opts, DefaultTranscript(f))
    proof.fri_last_value = (int(proof.fri_last_value) + 1) % f.p
    assert not verify(air_cls, proof, pub, opts, DefaultTranscript(f))


def test_ec_group_law_host():
    from lambda_elliptic_curves_tpu.curves.zoo import BLS12381Curve

    g = BLS12381Curve.generator()
    assert (g + g) + g == g * 3
    assert (g * 5) + (-g) == g * 4
