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


def test_pairing_bilinearity_host():
    """Host pairing gate: e(aP, bQ) == e(P, Q)^(ab) — covers the Miller
    loop, the Fp12 tower and the final exponentiation with zero device
    compiles (``math/src/elliptic_curve/short_weierstrass/curves/
    bls12_381/pairing.rs`` role)."""
    from lambda_elliptic_curves_tpu.curves.pairings import (
        BLS12381Pairing as cfg, pairing,
    )

    P = cfg.g1_curve.generator()
    Q = cfg.g2_generator()
    e1 = pairing(cfg, P, Q)
    assert pairing(cfg, P.operate_with_self(2), Q.mul(3)) == e1 ** 6
    assert e1 ** cfg.g1_curve.order == cfg.fp12(1)


def test_plonk_tiny_prove_verify():
    """Plonk gate: 4-gate circuit, naive-MSM KZG — end-to-end prove +
    verify + tamper-reject in one test (VERDICT r3 item 8)."""
    from lambda_elliptic_curves_tpu.commitments import (
        KateZaveruchaGoldberg, StructuredReferenceString,
    )
    from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing
    from lambda_elliptic_curves_tpu.fields import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.plonk import (
        CommonPreprocessedInput, ConstraintSystem, Prover,
        TestRandomFieldGenerator, Verifier, Witness, setup,
    )

    f = BLS12381Fr
    system = ConstraintSystem(f)
    x = system.new_public_input()
    y = system.new_public_input()
    e = system.new_variable()
    system.assert_eq(y, system.mul(x, e))
    cpi = CommonPreprocessedInput.from_constraint_system(system, 7)
    srs = StructuredReferenceString.insecure_setup(
        BLS12381Pairing, cpi.n + 6, tau=7913)
    kzg = KateZaveruchaGoldberg(BLS12381Pairing, srs, msm_method="naive")
    vk = setup(cpi, kzg)
    assignments = system.solve({x: f(4), e: f(3), y: f(12)})
    proof = Prover(kzg, TestRandomFieldGenerator(f)).prove(
        Witness.new(assignments, system),
        system.public_input_values(assignments), cpi, vk)
    assert Verifier(kzg).verify(
        proof, system.public_input_values(assignments), cpi, vk)
    assert not Verifier(kzg).verify(proof, [f(4), f(13)], cpi, vk)


def test_groth16_tiny_prove_verify():
    """Groth16 gate: the 3-constraint cubic circuit end-to-end.  All MSMs
    are tiny, so they ride the host fast path (`msm.py` LWT_MSM_HOST_MAX)
    — zero EC device compiles; the device MSM pipeline has its own tests
    (test_curves/test_g2/test_msm_chunked)."""
    import random

    from lambda_elliptic_curves_tpu.fields import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.groth16 import (
        prove, setup, verify,
    )
    from lambda_elliptic_curves_tpu.provers.groth16.qap import (
        QuadraticArithmeticProgram,
    )
    from lambda_elliptic_curves_tpu.provers.groth16.r1cs import R1CS

    fr = BLS12381Fr
    # x^3 + x + 5 == 35 (vars: 1, out, x, sym1, y, sym2)
    a = [[0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 0, 0], [0, 0, 1, 0, 1, 0],
         [5, 0, 0, 0, 0, 1]]
    b = [[0, 0, 1, 0, 0, 0], [0, 0, 1, 0, 0, 0], [1, 0, 0, 0, 0, 0],
         [1, 0, 0, 0, 0, 0]]
    c = [[0, 0, 0, 1, 0, 0], [0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 1],
         [0, 1, 0, 0, 0, 0]]
    r1cs = R1CS.from_matrices(a, b, c, number_of_inputs=2)
    qap = QuadraticArithmeticProgram.from_r1cs(fr, r1cs)
    witness = [1, 35, 3, 9, 27, 30]
    pk, vk = setup(qap, rng=random.Random(42))
    proof = prove(witness, qap, pk, rng=random.Random(7))
    assert verify(vk, proof, witness[:2])
    assert not verify(vk, proof, [1, 36])


def test_sharded_ntt_oracle_8dev():
    """Sharded-path gate: the 8-device four-step all-to-all NTT at n=64
    vs an exact host DFT (same program the driver dryrun compiles)."""
    from jax.sharding import Mesh

    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.parallel import sharded_ntt

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    n, p = 64, f.p
    ints = [(3 * i * i + i + 2) % p for i in range(n)]
    evals = sharded_ntt(f, f.array(ints), mesh, ordering="natural")
    got = [int(v) % p for v in
           f.to_ints(np.asarray(evals).reshape(f.num_digits, n))]
    w = f.params.primitive_root_of_unity(6)
    ws = [pow(w, k, p) for k in range(n)]
    want = [sum(v * ws[(j * k) % n] for j, v in enumerate(ints)) % p
            for k in range(n)]
    assert got == want
