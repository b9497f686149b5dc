"""Exercise 2 — a broken heart repeats itself.

A correctly-bound Schnorr signature (the challenge absorbs R, P and the
message) whose nonce generator is a counter that resets: two signatures
over different messages share ``k``.  Recover the key.
"""

from __future__ import annotations

from lambda_elliptic_curves_tpu.curves import StarkCurve
from lambda_elliptic_curves_tpu.hashes.keccak import keccak256

ORDER = StarkCurve.order


def _challenge(R, P, message: bytes) -> int:
    blob = (
        int(R.to_affine().x).to_bytes(32, "big")
        + int(P.to_affine().x).to_bytes(32, "big")
        + message
    )
    return int.from_bytes(keccak256(blob), "big") % ORDER


class Signer:
    """BUG: the "nonce" is a fixed counter seeded at construction — every
    signature from one signer uses the same k."""

    def __init__(self, x: int):
        self.x = x
        self.P = StarkCurve.generator() * x
        self._k = (x * 1103515245 + 12345) % ORDER or 1

    def sign(self, message: bytes):
        k = self._k  # BUG: never advances
        R = StarkCurve.generator() * k
        c = _challenge(R, self.P, message)
        s = (k + c * self.x) % ORDER
        return R, s


def verify(P, message: bytes, sig) -> bool:
    R, s = sig
    c = _challenge(R, P, message)
    return StarkCurve.generator() * s == R + P * c
