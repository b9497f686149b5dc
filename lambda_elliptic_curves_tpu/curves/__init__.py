"""Elliptic curves: point arithmetic (host + batched device), curve zoo,
MSM, pairings."""

from .weierstrass import WeierstrassCurve, ProjectivePoint, JacobianOps  # noqa: F401
from .zoo import (  # noqa: F401
    ALL_CURVES, BLS12377Curve, BLS12381Curve, BN254Curve, GrumpkinCurve,
    PallasCurve, Secp256k1Curve, Secp256r1Curve, Secq256k1Curve, StarkCurve,
    TestCurve1, VestaCurve,
)
from .msm import msm, msm_naive_host, msm_pippenger, msm_double_and_add  # noqa: F401
from .twists import (  # noqa: F401
    TwistCurve, TwistJacobianOps, bls12_377_twist, bls12_381_twist,
    bn254_twist, msm_g2_naive_host,
)
