"""The concrete short Weierstrass curves (parity:
``math/src/elliptic_curve/short_weierstrass/curves/**``).  All parameters
are the standard published curve constants, matching the reference's
generator choices exactly.
"""

from __future__ import annotations

from ..fields import zoo as F
from .weierstrass import WeierstrassCurve

BLS12381Curve = WeierstrassCurve(
    name="bls12_381",
    field=F.BLS12381Field,
    a=0, b=4,
    gx=int(
        "17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb", 16),
    gy=int(
        "8b3f481e3aaa0f1a09e30ed741d8ae4fcf5e095d5d00af600db18cb2c04b3edd"
        "03cc744a2888ae40caa232946c5e7e1", 16),
    order=F.BLS12_381_ORDER,
    cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
)

BLS12377Curve = WeierstrassCurve(
    name="bls12_377",
    field=F.BLS12377Field,
    a=0, b=1,
    gx=int(
        "8848defe740a67c8fc6225bf87ff5485951e2caa9d41bb188282c8bd37cb5cd5"
        "481512ffcd394eeab9b16eb21be9ef", 16),
    gy=int(
        "1914a69c5102eff1f674f5d30afeec4bd7fb348ca3e52d96d182ad44fb82305c"
        "2fe3d3634a9591afd82de55559c8ea6", 16),
    order=F.BLS12_377_ORDER,
    cofactor=0x170B5D44300000000000000000000000,
)

BN254Curve = WeierstrassCurve(
    name="bn254",
    field=F.BN254Field,
    a=0, b=3,
    gx=1, gy=2,
    order=F.BN254_ORDER,
)

GrumpkinCurve = WeierstrassCurve(
    name="grumpkin",
    field=F.BN254Fr,  # 2-cycle with BN254
    a=0, b=(-17) % F.BN254_ORDER,
    gx=1,
    gy=0x2CF135E7506A45D632D270D45F1181294833FC48D823F272C,
    order=F.BN254_PRIME,
)

PallasCurve = WeierstrassCurve(
    name="pallas",
    field=F.PallasField,
    a=0, b=5,
    gx=F.PALLAS_PRIME - 1, gy=2,
    order=F.VESTA_PRIME,
)

VestaCurve = WeierstrassCurve(
    name="vesta",
    field=F.VestaField,
    a=0, b=5,
    gx=F.VESTA_PRIME - 1, gy=2,
    order=F.PALLAS_PRIME,
)

Secp256k1Curve = WeierstrassCurve(
    name="secp256k1",
    field=F.Secp256k1Field,
    a=0, b=7,
    gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
    order=F.SECP256K1_ORDER,
)

Secq256k1Curve = WeierstrassCurve(
    name="secq256k1",
    field=F.Secp256k1Fr,  # base field = secp256k1 scalar field
    a=0, b=7,
    gx=0x76C39F5585CB160EB6B06C87A2CE32E23134E45A097781A6A24288E37702EDA6,
    gy=0x3FFC646C7B2918B5DC2D265A8E82A7F7D18983D26E8DC055A4120DDAD952677F,
    order=F.SECP256K1_PRIME,
)

Secp256r1Curve = WeierstrassCurve(
    name="secp256r1",
    field=F.Secp256r1Field,
    a=F.SECP256R1_PRIME - 3,
    b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
    gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
    gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
    order=F.SECP256R1_ORDER,
)

StarkCurve = WeierstrassCurve(
    name="stark_curve",
    field=F.Stark252,
    a=1,
    b=0x6F21413EFBE40DE150E596D72F7A8C5609AD26C15C915C1F4CDFCB99CEE9E89,
    gx=0x1EF15C18599971B7BECED415A40F0C7DEACFD9B0D1819E03D723D8BC943CFCA,
    gy=0x5668060AA49730B7BE4801DF46EC62DE53ECD11ABE43A32873000C36E8DC1F,
    order=F.STARK_CURVE_ORDER,
)

# Toy curve used across the reference's unit tests
# (test_curve_1.rs: y^2 = x^3 + x over F59, generator (35, 31), order 5)
from ..fields.params import FieldParams as _FieldParams
from ..fields.field import PrimeField as _PrimeField

F59 = _PrimeField(_FieldParams(name="f59", p=59))
TestCurve1 = WeierstrassCurve(
    name="test_curve_1", field=F59, a=1, b=0, gx=35, gy=31, order=5,
)

ALL_CURVES = {
    c.name: c
    for c in [
        BLS12381Curve, BLS12377Curve, BN254Curve, GrumpkinCurve,
        PallasCurve, VestaCurve, Secp256k1Curve, Secq256k1Curve,
        Secp256r1Curve, StarkCurve, TestCurve1,
    ]
}
