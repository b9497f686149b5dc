"""Plonk end-to-end over the BLS12-381 KZG scheme.

Circuit (reference's circuit_1 style): private e; public x, y;
asserts y == x * e.
"""

import pytest

from lambda_elliptic_curves_tpu.commitments import (
    KateZaveruchaGoldberg, StructuredReferenceString,
)
from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing
from lambda_elliptic_curves_tpu.fields import BLS12381Fr
from lambda_elliptic_curves_tpu.provers.plonk import (
    CommonPreprocessedInput, ConstraintSystem, Prover,
    TestRandomFieldGenerator, Verifier, Witness, setup,
)

ORDER_R_MINUS_1_ROOT_UNITY = 7


@pytest.fixture(scope="module")
def plonk_setup():
    f = BLS12381Fr
    system = ConstraintSystem(f)
    x = system.new_public_input()
    y = system.new_public_input()
    e = system.new_variable()
    z = system.mul(x, e)
    system.assert_eq(y, z)

    cpi = CommonPreprocessedInput.from_constraint_system(
        system, ORDER_R_MINUS_1_ROOT_UNITY
    )
    srs = StructuredReferenceString.insecure_setup(
        BLS12381Pairing, cpi.n + 6, tau=7913
    )
    kzg = KateZaveruchaGoldberg(BLS12381Pairing, srs, msm_method="naive")
    vk = setup(cpi, kzg)
    return f, system, (x, y, e), cpi, kzg, vk


def test_prove_verify(plonk_setup):
    f, system, (x, y, e), cpi, kzg, vk = plonk_setup
    assignments = system.solve({x: f(4), e: f(3), y: f(12)})
    witness = Witness.new(assignments, system)
    public_input = system.public_input_values(assignments)

    prover = Prover(kzg, TestRandomFieldGenerator(f))
    proof = prover.prove(witness, public_input, cpi, vk)
    assert Verifier(kzg).verify(proof, public_input, cpi, vk)


def test_wrong_public_input_rejected(plonk_setup):
    f, system, (x, y, e), cpi, kzg, vk = plonk_setup
    assignments = system.solve({x: f(4), e: f(3), y: f(12)})
    witness = Witness.new(assignments, system)
    prover = Prover(kzg, TestRandomFieldGenerator(f))
    proof = prover.prove(witness, [f(4), f(12)], cpi, vk)
    assert not Verifier(kzg).verify(proof, [f(4), f(13)], cpi, vk)


def test_solver_hints_and_ops():
    f = BLS12381Fr
    system = ConstraintSystem(f)
    v = system.new_variable()
    w = system.inv(v)
    b = system.new_boolean()
    s = system.if_else(b, v, w)
    assignments = system.solve({v: f(4), b: f(1)})
    assert assignments[w] == f(4).inv()
    assert assignments[s] == f(4)


def test_solver_detects_inconsistency():
    from lambda_elliptic_curves_tpu.utils.errors import ProvingError

    f = BLS12381Fr
    system = ConstraintSystem(f)
    a = system.new_variable()
    b = system.new_variable()
    system.assert_eq(a, b)
    with pytest.raises(ProvingError):
        system.solve({a: f(1), b: f(2)})
