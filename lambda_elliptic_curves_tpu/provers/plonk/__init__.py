"""Plonk proof system (parity: ``provers/plonk/``)."""

from .constraint_system import ConstraintSystem, Constraint, Hint, get_permutation  # noqa: F401
from .setup import (  # noqa: F401
    CommonPreprocessedInput, VerificationKey, Witness, setup,
    new_strong_fiat_shamir_transcript,
)
from .prover import Prover, Proof, RandomFieldGenerator, TestRandomFieldGenerator  # noqa: F401
from .verifier import Verifier  # noqa: F401
