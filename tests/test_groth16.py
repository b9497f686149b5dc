"""Groth16 end-to-end (parity: ``provers/groth16`` integration tests).

Circuit: out = x^3 (two gates: y = x*x, out = y*x).
Witness layout [1, out, x, y]; public = [1, out].
"""

import random

import pytest

from lambda_elliptic_curves_tpu.fields import BLS12381Fr
from lambda_elliptic_curves_tpu.provers.groth16 import (
    QuadraticArithmeticProgram, R1CS, prove, setup, verify,
)


@pytest.fixture(scope="module")
def system():
    r1cs = R1CS.from_matrices(
        a=[[0, 0, 1, 0], [0, 0, 0, 1]],
        b=[[0, 0, 1, 0], [0, 0, 1, 0]],
        c=[[0, 0, 0, 1], [0, 1, 0, 0]],
        number_of_inputs=2,
    )
    qap = QuadraticArithmeticProgram.from_r1cs(BLS12381Fr, r1cs)
    pk, vk = setup(qap, rng=random.Random(1))
    return qap, pk, vk


def test_prove_and_verify(system):
    qap, pk, vk = system
    x = 3
    witness = [1, x**3, x, x**2]
    proof = prove(witness, qap, pk, rng=random.Random(2))
    assert verify(vk, proof, witness[:2])


def test_wrong_public_input_rejected(system):
    qap, pk, vk = system
    witness = [1, 27, 3, 9]
    proof = prove(witness, qap, pk, rng=random.Random(3))
    assert not verify(vk, proof, [1, 28])


def test_proof_serialization(system):
    qap, pk, vk = system
    proof = prove([1, 27, 3, 9], qap, pk, rng=random.Random(4))
    blob = proof.serialize()
    assert isinstance(blob, bytes) and len(blob) > 100
