"""Exercise 5 — toxic waste in the dumpster.

A KZG ceremony (parity target: the reference's ``exercises/challenge_2``
and ``challenge_3`` KZG attacks) whose "random" trapdoor tau is derived
from a low-entropy seed: the ceremony coordinator hashed a 12-bit counter
with Keccak "because the hash makes it uniform".  The published SRS is
perfectly well-formed — but anyone can brute-force the seed, recover tau,
and then *open any commitment to any value at any point*:

    pi_forged = (C - y_false * G1) * inv(tau - z)

satisfies  e(C - y_false G1, G2) == e(pi, (tau - z) G2)  by construction,
so the verifier accepts an evaluation the committed polynomial never had.

The lesson: KZG soundness rests entirely on tau being unknowable; a
well-formed SRS carries no evidence of how its trapdoor was sampled.

Find the attack (see ``tests/test_exercises.py``).
"""

from __future__ import annotations

from lambda_elliptic_curves_tpu.commitments.kzg import (
    KateZaveruchaGoldberg, StructuredReferenceString,
)
from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing
from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr
from lambda_elliptic_curves_tpu.hashes.keccak import keccak256

CFG = BLS12381Pairing
Fr = BLS12381Fr

SEED_BITS = 8  # "nobody will guess it out of 256" — the flaw
SRS_SIZE = 8


def _tau_from_seed(seed: int) -> int:
    """The ceremony's tau derivation (public knowledge: it was in the
    coordinator's published script)."""
    digest = keccak256(b"kzg-ceremony-v1:" + seed.to_bytes(2, "big"))
    return int.from_bytes(digest, "big") % CFG.r


def run_ceremony(seed: int) -> StructuredReferenceString:
    """What the coordinator ran.  The seed is thrown away afterwards —
    but it only ever had SEED_BITS bits of entropy."""
    assert 0 <= seed < (1 << SEED_BITS)
    return StructuredReferenceString.insecure_setup(
        CFG, SRS_SIZE, tau=_tau_from_seed(seed))


def make_scheme(srs: StructuredReferenceString) -> KateZaveruchaGoldberg:
    return KateZaveruchaGoldberg(CFG, srs)


# ---------------------------------------------------------------------------
# the attack surface (what tests/test_exercises.py exploits)
# ---------------------------------------------------------------------------

def recover_tau(srs: StructuredReferenceString) -> int:
    """Brute-force the ceremony seed: tau is confirmed when
    tau * G1 == srs.powers_main_group[1]."""
    g1 = CFG.g1_curve.generator()
    target = srs.powers_main_group[1]
    for seed in range(1 << SEED_BITS):
        tau = _tau_from_seed(seed)
        if g1.operate_with_self(tau) == target:
            return tau
    raise ValueError("no seed matched — ceremony was honest after all?")


def forge_opening(srs: StructuredReferenceString, tau: int, commitment,
                  z: int, y_false: int):
    """A 'proof' that the committed polynomial evaluates to ``y_false``
    at ``z`` — valid for ANY commitment once tau is known."""
    g1 = CFG.g1_curve.generator()
    numerator = commitment.operate_with(
        g1.operate_with_self(int(y_false) % CFG.r).neg())
    inv = pow((tau - z) % CFG.r, -1, CFG.r)
    return numerator.operate_with_self(inv)
