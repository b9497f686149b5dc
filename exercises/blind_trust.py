"""Exercise 1 — blind trust in the transcript.

A Schnorr-style proof of knowledge of the discrete log of ``P = x*G``
over the Stark curve, made non-interactive with Fiat–Shamir.  The flaw:
the challenge binds the *message* but NOT the commitment ``R`` or the
public key ``P``.  Because the challenge is independent of ``R``, a
forger may pick the response first and solve for the commitment —
producing "proofs" for public keys whose secret is unknown.

Find the forgery (see ``tests/test_exercises.py``).
"""

from __future__ import annotations

import random

from lambda_elliptic_curves_tpu.curves import StarkCurve
from lambda_elliptic_curves_tpu.hashes.keccak import keccak256

ORDER = StarkCurve.order


def _challenge(message: bytes) -> int:
    # BUG: neither R nor P is absorbed.
    return int.from_bytes(keccak256(message), "big") % ORDER


def keygen(rng: random.Random):
    x = rng.randrange(1, ORDER)
    return x, StarkCurve.generator() * x


def prove(x: int, message: bytes, rng: random.Random):
    k = rng.randrange(1, ORDER)
    R = StarkCurve.generator() * k
    c = _challenge(message)
    s = (k + c * x) % ORDER
    return R, s


def verify(P, message: bytes, proof) -> bool:
    R, s = proof
    c = _challenge(message)
    return StarkCurve.generator() * s == R + P * c
