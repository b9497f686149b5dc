"""Finite fields: parameter records, batched TPU digit kernels, host elements."""

from .params import FieldParams, DIGIT_BITS, DIGIT_MASK
from .element import FieldElement
from .field import PrimeField
from .zoo import (  # noqa: F401
    ALL_FIELDS,
    BabyBear, BabyBearFull, Goldilocks, Mersenne31, Stark101, Stark252,
    BLS12377Field, BLS12377Fr, BLS12381Field, BLS12381Fr,
    BN254Field, BN254Fr, GrumpkinField, GrumpkinFr,
    PallasField, PallasFr, VestaField, VestaFr,
    Secp256k1Field, Secp256k1Fr, Secq256k1Field, Secq256k1Fr,
    Secp256r1Field, Secp256r1Fr,
    StarkCurveFr, P448Goldilocks, BandersnatchField,
    U64TestField, F13, F17,
    BabyBearQuadratic, BabyBearQuartic,
    Mersenne31Complex, Mersenne31Quartic,
    BABYBEAR_PRIME, BLS12_377_ORDER, BLS12_377_PRIME, BLS12_381_ORDER,
    BLS12_381_PRIME, BN254_ORDER, BN254_PRIME, GOLDILOCKS_PRIME,
    MERSENNE31_PRIME, STARK252_PRIME, STARK_CURVE_ORDER,
)

__all__ = [
    "FieldParams", "FieldElement", "PrimeField", "ALL_FIELDS",
    "DIGIT_BITS", "DIGIT_MASK",
]
