"""Exercise 3 — Shamir sharing with a leak.

A (k, n) Shamir secret sharing over Stark252 where the dealer "saves
randomness" by deriving every polynomial coefficient from the previous
one with a public linear recurrence.  One share is then enough to walk
the recurrence and recover the secret, no matter the threshold.
"""

from __future__ import annotations

from lambda_elliptic_curves_tpu.fields import Stark252 as F

A = 1103515245
B = 12345


def deal(secret: int, k: int, n: int):
    """Shares (i, p(i)) for i=1..n of a degree-(k-1) polynomial with
    p(0) = secret.  BUG: coeff[j+1] = A*coeff[j] + B instead of random."""
    coeffs = [secret % F.p]
    for _ in range(k - 1):
        coeffs.append((A * coeffs[-1] + B) % F.p)
    return [(i, _eval(coeffs, i)) for i in range(1, n + 1)]


def _eval(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % F.p
    return acc


def reconstruct(shares, k: int) -> int:
    """Lagrange interpolation at 0 from k shares (the honest path)."""
    if len(shares) < k:
        raise ValueError("not enough shares")
    pts = shares[:k]
    secret = 0
    for i, (xi, yi) in enumerate(pts):
        num, den = 1, 1
        for j, (xj, _) in enumerate(pts):
            if i != j:
                num = num * (-xj) % F.p
                den = den * (xi - xj) % F.p
        secret = (secret + yi * num * pow(den, -1, F.p)) % F.p
    return secret
