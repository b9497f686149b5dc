"""Groth16 zk-SNARK (parity: ``provers/groth16/``)."""

from .r1cs import R1CS, ConstraintSystem  # noqa: F401
from .qap import QuadraticArithmeticProgram  # noqa: F401
from .setup import setup, ProvingKey, VerifyingKey  # noqa: F401
from .prover import Proof, prove  # noqa: F401
from .verifier import verify  # noqa: F401
