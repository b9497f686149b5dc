"""The concrete prime fields (parity with ``math/src/field/fields/**``).

All moduli and two-adic generators are standard published protocol
parameters.  Where lambdaworks pins a specific two-adic primitive root we
use the same value so NTT domains agree bit-for-bit:

* Stark252  — ``fft_friendly/stark_252_prime_field.rs:20-24``
* Stark101  — ``fft_friendly/stark_101_prime_field.rs:14-22``
* BabyBear  — ``fft_friendly/babybear.rs:29-31`` (two-adicity 24, root 21)
* BLS12-381 Fr — ``curves/bls12_381/default_types.rs:26-29``
* Goldilocks — ``test_fields/u64_test_field.rs:102`` convention
  (two-adicity 32, root 1753635133440165772, the plonky2/winterfell value)

For fields the reference leaves without FFT data, roots are derived from a
small primitive element g as g^((p-1)/2^adicity).
"""

from __future__ import annotations

from .params import FieldParams
from .field import PrimeField


def _derived_root(p: int, adicity: int, generator: int) -> int:
    return pow(generator, (p - 1) >> adicity, p)


# --- STARK-friendly fields --------------------------------------------------

STARK252_PRIME = (2**251) + 17 * (2**192) + 1

Stark252 = PrimeField(FieldParams(
    name="stark252",
    p=STARK252_PRIME,
    two_adicity=192,
    two_adic_root=int(
        "5282db87529cfa3f0464519c8b0fa5ad187148e11a61616070024f42f8ef94", 16
    ),
))

Stark101 = PrimeField(FieldParams(
    name="stark101",
    p=3 * 2**30 + 1,  # 0xc0000001
    two_adicity=30,
    two_adic_root=0xBB6E79D,
))

BABYBEAR_PRIME = 2**31 - 2**27 + 1  # 2013265921

BabyBear = PrimeField(FieldParams(
    name="babybear",
    p=BABYBEAR_PRIME,
    two_adicity=24,
    two_adic_root=21,
))

# Full two-adicity variant (adicity 27, root derived from the generator 31).
BabyBearFull = PrimeField(FieldParams(
    name="babybear_full",
    p=BABYBEAR_PRIME,
    two_adicity=27,
    two_adic_root=_derived_root(BABYBEAR_PRIME, 27, 31),
))

GOLDILOCKS_PRIME = 2**64 - 2**32 + 1

Goldilocks = PrimeField(FieldParams(
    name="goldilocks",
    p=GOLDILOCKS_PRIME,
    two_adicity=32,
    two_adic_root=1753635133440165772,
    # reference backend is the plain u64 field (u64_goldilocks_field.rs):
    # AsBytes serializes the canonical value
    serialization_montgomery=False,
))

MERSENNE31_PRIME = 2**31 - 1

Mersenne31 = PrimeField(FieldParams(
    name="mersenne31",
    p=MERSENNE31_PRIME,
    two_adicity=1,
    two_adic_root=MERSENNE31_PRIME - 1,  # order-2 root; circle FFT is used instead
    # reference backend is the plain u32 field (mersenne31/field.rs)
    serialization_montgomery=False,
))

# --- pairing curve fields ----------------------------------------------------

BLS12_381_PRIME = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab", 16
)
BLS12_381_ORDER = int(
    "73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16
)

BLS12381Field = PrimeField(FieldParams(name="bls12_381_base", p=BLS12_381_PRIME))

BLS12381Fr = PrimeField(FieldParams(
    name="bls12_381_scalar",
    p=BLS12_381_ORDER,
    two_adicity=32,
    two_adic_root=int(
        "2ab00961a08a499d84dd396c349d9b3cc5e433d6fa78eb2b54cc39d9bb30bbb7", 16
    ),
))

BLS12_377_PRIME = int(
    "1ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba0948001"
    "70b5d44300000008508c00000000001", 16
)
BLS12_377_ORDER = int(
    "12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001", 16
)

BLS12377Field = PrimeField(FieldParams(name="bls12_377_base", p=BLS12_377_PRIME))

BLS12377Fr = PrimeField(FieldParams(
    name="bls12_377_scalar",
    p=BLS12_377_ORDER,
    two_adicity=47,
    two_adic_root=_derived_root(BLS12_377_ORDER, 47, 22),
))

BN254_PRIME = int(
    "30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47", 16
)
BN254_ORDER = int(
    "30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001", 16
)

BN254Field = PrimeField(FieldParams(name="bn254_base", p=BN254_PRIME))

BN254Fr = PrimeField(FieldParams(
    name="bn254_scalar",
    p=BN254_ORDER,
    two_adicity=28,
    two_adic_root=_derived_root(BN254_ORDER, 28, 5),
))

# Grumpkin forms a 2-cycle with BN254: its base field is BN254's scalar
# field and vice versa (``curves/grumpkin/curve.rs``).
GrumpkinField = BN254Fr
GrumpkinFr = BN254Field

# --- Pasta curves (Pallas / Vesta 2-cycle) -----------------------------------

PALLAS_PRIME = int(
    "40000000000000000000000000000000224698fc094cf91b992d30ed00000001", 16
)
VESTA_PRIME = int(
    "40000000000000000000000000000000224698fc0994a8dd8c46eb2100000001", 16
)

PallasField = PrimeField(FieldParams(
    name="pallas_base", p=PALLAS_PRIME,
    two_adicity=32, two_adic_root=_derived_root(PALLAS_PRIME, 32, 5),
))
VestaField = PrimeField(FieldParams(
    name="vesta_base", p=VESTA_PRIME,
    two_adicity=32, two_adic_root=_derived_root(VESTA_PRIME, 32, 5),
))
# scalar fields: the 2-cycle
PallasFr = VestaField
VestaFr = PallasField

# --- secp/secq families -------------------------------------------------------

SECP256K1_PRIME = 2**256 - 2**32 - 977
SECP256K1_ORDER = int(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16
)

Secp256k1Field = PrimeField(FieldParams(name="secp256k1_base", p=SECP256K1_PRIME))
Secp256k1Fr = PrimeField(FieldParams(name="secp256k1_scalar", p=SECP256K1_ORDER))
# secq256k1 swaps base and scalar (``curves/secq256k1``)
Secq256k1Field = Secp256k1Fr
Secq256k1Fr = Secp256k1Field

SECP256R1_PRIME = int(
    "ffffffff00000001000000000000000000000000ffffffffffffffffffffffff", 16
)
SECP256R1_ORDER = int(
    "ffffffff00000000ffffffffffffffffbce6faada7179e84f3b9cac2fc632551", 16
)
Secp256r1Field = PrimeField(FieldParams(name="secp256r1_base", p=SECP256R1_PRIME))
Secp256r1Fr = PrimeField(FieldParams(name="secp256r1_scalar", p=SECP256R1_ORDER))

# --- Stark curve (the curve over Stark252) ------------------------------------

STARK_CURVE_ORDER = int(
    "800000000000010ffffffffffffffffb781126dcae7b2321e66a241adc64d2f", 16
)
StarkCurveFr = PrimeField(FieldParams(name="stark_curve_scalar", p=STARK_CURVE_ORDER))

# --- Edwards-family fields -----------------------------------------------------

P448_GOLDILOCKS_PRIME = 2**448 - 2**224 - 1
P448Goldilocks = PrimeField(FieldParams(name="p448_goldilocks", p=P448_GOLDILOCKS_PRIME))

# Bandersnatch lives over BLS12-381's scalar field (``edwards/curves/bandersnatch``)
BandersnatchField = BLS12381Fr

# --- tiny test fields (parity with math/src/field/test_fields) -----------------

U64TestField = PrimeField(FieldParams(
    name="u64_test", p=GOLDILOCKS_PRIME,
    two_adicity=32, two_adic_root=1753635133440165772,
))

# F17 / F13 style toy fields used across reference unit tests
F17 = PrimeField(FieldParams(name="f17", p=17, two_adicity=4, two_adic_root=3))
F13 = PrimeField(FieldParams(name="f13", p=13, two_adicity=2, two_adic_root=5))


# --- named extension fields ---------------------------------------------
# BabyBear degree-4 (``fft_friendly/quartic_babybear.rs``: x^4 + 11, i.e.
# x^4 = -11), built as the tower Fp2 = Fp[y]/(y^2 + 11), Fp4 = Fp2[z]/(z^2
# - y): z^4 = y^2 = -11.  Coefficient mapping to the reference basis
# {1, x, x^2, x^3}: ((a, b), (c, d)) <-> [a, c, b, d].
from .extensions import ExtensionField  # noqa: E402

BabyBearQuadratic = ExtensionField(
    "babybear_fp2", BabyBear, BABYBEAR_PRIME - 11, 2
)
BabyBearQuartic = ExtensionField(
    "babybear_fp4", BabyBearQuadratic, (0, 1), 2
)

# Mersenne31 degree-2 "complex" (i^2 = -1) and degree-4 over it with
# non-residue 2 + i (``mersenne31/extensions.rs``).
Mersenne31Complex = ExtensionField(
    "mersenne31_fp2", Mersenne31, MERSENNE31_PRIME - 1, 2
)
Mersenne31Quartic = ExtensionField(
    "mersenne31_fp4", Mersenne31Complex, (2, 1), 2
)


ALL_FIELDS = {
    f.name: f
    for f in [
        Stark252, Stark101, BabyBear, BabyBearFull, Goldilocks, Mersenne31,
        BLS12381Field, BLS12381Fr, BLS12377Field, BLS12377Fr,
        BN254Field, BN254Fr, PallasField, VestaField,
        Secp256k1Field, Secp256k1Fr, Secp256r1Field, Secp256r1Fr,
        StarkCurveFr, P448Goldilocks, U64TestField, F17, F13,
    ]
}
