"""End-to-end tests for the example SNARKs and the circom adapter
(parity: ``examples/pinocchio/src/``, ``examples/baby-snark/src/``,
``provers/groth16/circom-adapter/src/lib.rs`` integration tests).

These are the modules VERDICT r1 flagged as implemented-but-unproven.
"""

import pathlib
import random

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


# ---------------------------------------------------------------------------
# Pinocchio
# ---------------------------------------------------------------------------

def _pinocchio_instance():
    """Gates over [1, x1, x2, mid, out]: x1*x2 = mid; mid*x1 = out."""
    from lambda_elliptic_curves_tpu.examples import pinocchio as pk

    a_rows = [[0, 1, 0, 0, 0], [0, 0, 0, 1, 0]]
    b_rows = [[0, 0, 1, 0, 0], [0, 1, 0, 0, 0]]
    c_rows = [[0, 0, 0, 1, 0], [0, 0, 0, 0, 1]]
    qap = pk.PinocchioQAP.from_r1cs(a_rows, b_rows, c_rows,
                                    number_of_inputs=2, number_of_outputs=1)
    x1, x2 = 3, 4
    mid, out = x1 * x2, x1 * x1 * x2
    return pk, qap, [x1, x2, mid, out], [x1, x2, out]


def test_pinocchio_prove_verify():
    pk_mod, qap, witness, io = _pinocchio_instance()
    ek, vk = pk_mod.setup(qap, rng=random.Random(5))
    proof = pk_mod.generate_proof(ek, qap, witness)
    assert pk_mod.verify(vk, proof, io)


def test_pinocchio_rejects_wrong_output():
    pk_mod, qap, witness, io = _pinocchio_instance()
    ek, vk = pk_mod.setup(qap, rng=random.Random(5))
    proof = pk_mod.generate_proof(ek, qap, witness)
    bad_io = [io[0], io[1], io[2] + 1]
    assert not pk_mod.verify(vk, proof, bad_io)


def test_pinocchio_rejects_invalid_witness():
    pk_mod, qap, witness, _ = _pinocchio_instance()
    from lambda_elliptic_curves_tpu.examples.pinocchio import Fr

    bad = list(witness)
    bad[2] += 1  # mid no longer equals x1*x2 -> p not divisible by target
    with pytest.raises(ValueError):
        qap.h_polynomial([Fr(c) for c in bad])


# ---------------------------------------------------------------------------
# BabySNARK
# ---------------------------------------------------------------------------

def _baby_snark_instance():
    """(U.w)^2 = 1 with U = I3 over inputs [1, 1, -1]; 2 public."""
    from lambda_elliptic_curves_tpu.examples import baby_snark as bs

    matrix = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    scs = bs.SquareConstraintSystem.from_matrix(matrix,
                                                number_of_public_inputs=2)
    ssp = bs.SquareSpanProgram(scs)
    inputs = [1, 1, bs.Fr.p - 1]
    return bs, ssp, inputs


def test_baby_snark_prove_verify():
    bs, ssp, inputs = _baby_snark_instance()
    assert ssp.check_valid(inputs)
    pk, vk = bs.setup(ssp, rng=random.Random(11))
    proof = bs.prove(inputs, ssp, pk, rng=random.Random(3))
    assert bs.verify(vk, proof, inputs[:2])


def test_baby_snark_rejects_wrong_public():
    bs, ssp, inputs = _baby_snark_instance()
    pk, vk = bs.setup(ssp, rng=random.Random(11))
    proof = bs.prove(inputs, ssp, pk, rng=random.Random(3))
    assert not bs.verify(vk, proof, [1, 2])


def test_baby_snark_rejects_invalid_witness():
    bs, ssp, _ = _baby_snark_instance()
    pk, vk = bs.setup(ssp, rng=random.Random(11))
    with pytest.raises(ValueError):
        bs.prove([1, 1, 3], ssp, pk, rng=random.Random(3))


# ---------------------------------------------------------------------------
# circom adapter -> Groth16 e2e (fixture mirrors snarkjs r1cs-to-json output
# for `out <== a * b` with public a, private b)
# ---------------------------------------------------------------------------

def _circom_fixture():
    from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.groth16.circom_adapter import (
        circom_to_lambda,
    )

    r1cs_json = (FIXTURES / "circom_mul.r1cs.json").read_text()
    witness_json = (FIXTURES / "circom_mul.witness.json").read_text()
    return circom_to_lambda(BLS12381Fr, r1cs_json, witness_json)


def test_circom_adapter_reorders_witness():
    qap, witness = _circom_fixture()
    # circom order [1, out, a, b] -> lambda order [1, a, b, out]
    assert witness == [1, 3, 5, 15]
    # "1" + the one public input
    assert qap.num_of_public_inputs == 2


def test_circom_adapter_constraint_satisfied():
    qap, witness = _circom_fixture()
    p = qap.field.p
    for g in range(qap.num_of_gates):
        a = sum(c * w for c, w in zip(qap.a[g], witness)) % p
        b = sum(c * w for c, w in zip(qap.b[g], witness)) % p
        c_ = sum(c * w for c, w in zip(qap.c[g], witness)) % p
        assert a * b % p == c_


def test_circom_groth16_end_to_end():
    from lambda_elliptic_curves_tpu.provers.groth16 import (
        prove, setup, verify,
    )

    qap, witness = _circom_fixture()
    pk, vk = setup(qap, rng=random.Random(42))
    proof = prove(witness, qap, pk, rng=random.Random(7))
    assert verify(vk, proof, witness[:qap.num_of_public_inputs])
    # wrong public input rejected
    assert not verify(vk, proof, [1, 4])


# ---------------------------------------------------------------------------
# arkworks adapter -> Groth16 e2e (fixture mirrors an arkworks
# ConstraintMatrices export of x^3 + x + 5 = out with x private;
# parity: provers/groth16/arkworks-adapter/src/lib.rs:107)
# ---------------------------------------------------------------------------

def _arkworks_fixture():
    from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.groth16.arkworks_adapter import (
        arkworks_to_lambda,
    )

    raw = (FIXTURES / "arkworks_cubic.r1cs.json").read_text()
    return arkworks_to_lambda(BLS12381Fr, raw)


def test_arkworks_adapter_densifies_matrices():
    r1cs, witness = _arkworks_fixture()
    assert witness == [1, 35, 3, 9, 27]
    assert r1cs.number_of_inputs == 2
    assert r1cs.witness_size == 5
    # third constraint carries the constant coefficient 5 on the one-wire
    assert r1cs.a[2][0] == 5
    # rows satisfy a.w * b.w == c.w
    p = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
    for g in range(r1cs.number_of_constraints):
        a = sum(c * w for c, w in zip(r1cs.a[g], witness)) % p
        b = sum(c * w for c, w in zip(r1cs.b[g], witness)) % p
        c_ = sum(c * w for c, w in zip(r1cs.c[g], witness)) % p
        assert a * b % p == c_


def test_arkworks_groth16_end_to_end():
    from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.groth16 import (
        prove, setup, verify,
    )
    from lambda_elliptic_curves_tpu.provers.groth16.qap import (
        QuadraticArithmeticProgram,
    )

    r1cs, witness = _arkworks_fixture()
    qap = QuadraticArithmeticProgram.from_r1cs(BLS12381Fr, r1cs)
    pk, vk = setup(qap, rng=random.Random(11))
    proof = prove(witness, qap, pk, rng=random.Random(3))
    assert verify(vk, proof, witness[:2])
    # wrong claimed output rejected
    assert not verify(vk, proof, [1, 36])


def test_prove_verify_circom_tutorial():
    """The circom e2e tutorial example runs its default fixture
    (``examples/prove-verify-circom/src/main.rs`` parity)."""
    from lambda_elliptic_curves_tpu.examples.prove_verify_circom import (
        prove_and_verify,
    )

    r1cs = (FIXTURES / "circom_mul.r1cs.json").read_text()
    wtns = (FIXTURES / "circom_mul.witness.json").read_text()
    proof, vk, pub, ok = prove_and_verify(r1cs, wtns, seed=5)
    assert ok
    # lambda order is [1, inputs..., outputs...]; public = [1] + inputs
    # (lib.rs:23 counts the one-wire plus nPubInputs)
    assert pub == [1, 3]


def test_arkworks_adapter_rejects_bad_export():
    from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.groth16.arkworks_adapter import (
        arkworks_to_lambda,
    )

    bad = ('{"num_instance_variables": 2, "num_witness_variables": 1, '
           '"a": [[["1", 9]]], "b": [[["1", 0]]], "c": [[["1", 1]]]}')
    with pytest.raises(ValueError):
        arkworks_to_lambda(BLS12381Fr, bad)


def test_circom_binary_artifacts_match_json_path():
    """The binary .r1cs/.wtns parsers (iden3 r1csfile/wtnsfile spec v1 —
    the formats the circom/snarkjs toolchain actually writes) must yield
    the same QAP + witness as the JSON export path, and the result must
    prove/verify end-to-end."""
    import random

    from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr
    from lambda_elliptic_curves_tpu.provers.groth16 import prove, setup, verify
    from lambda_elliptic_curves_tpu.provers.groth16.circom_adapter import (
        circom_bin_to_lambda, circom_to_lambda, parse_r1cs_bin,
        parse_wtns_bin,
    )

    r1cs_bytes = (FIXTURES / "circom_mul.r1cs").read_bytes()
    wtns_bytes = (FIXTURES / "circom_mul.wtns").read_bytes()
    qap_b, wit_b = circom_bin_to_lambda(BLS12381Fr, r1cs_bytes, wtns_bytes)
    qap_j, wit_j = circom_to_lambda(
        BLS12381Fr, (FIXTURES / "circom_mul.r1cs.json").read_text(),
        (FIXTURES / "circom_mul.witness.json").read_text())
    assert wit_b == wit_j
    assert qap_b.a == qap_j.a and qap_b.b == qap_j.b and qap_b.c == qap_j.c
    assert qap_b.num_of_public_inputs == qap_j.num_of_public_inputs
    pk, vk = setup(qap_b, rng=random.Random(5))
    proof = prove(wit_b, qap_b, pk, rng=random.Random(6))
    assert verify(vk, proof, wit_b[: qap_b.num_of_public_inputs])
    # malformed artifacts are rejected, not crashed on
    import pytest as _pytest

    from lambda_elliptic_curves_tpu.utils.errors import DeserializationError

    with _pytest.raises(DeserializationError):
        parse_r1cs_bin(b"nope" + r1cs_bytes[4:])
    with _pytest.raises(DeserializationError):
        parse_r1cs_bin(r1cs_bytes[:40])
    with _pytest.raises(DeserializationError):
        parse_wtns_bin(wtns_bytes[:10])
