"""Shamir secret sharing (parity:
``examples/shamir_secret_sharing/src/shamir_secret_sharing.rs``)."""

from __future__ import annotations

import dataclasses
import secrets

from ..fields.element import FieldElement
from ..poly.polynomial import Polynomial


@dataclasses.dataclass
class Share:
    x: FieldElement
    y: FieldElement


class ShamirSecretSharing:
    def __init__(self, field, secret, k: int):
        """Threshold k: any k shares recover the secret."""
        self.field = field
        self.k = k
        coeffs = [field(secret)] + [
            field(secrets.randbelow(field.p)) for _ in range(k - 1)
        ]
        self._poly = Polynomial(field, coeffs)

    def generate_shares(self, n: int) -> list:
        if n < self.k:
            raise ValueError("need at least k shares")
        xs, shares = set(), []
        while len(shares) < n:
            x = secrets.randbelow(self.field.p - 1) + 1
            if x in xs:
                continue
            xs.add(x)
            fx = self.field(x)
            shares.append(Share(fx, self._poly.evaluate(fx)))
        return shares

    @staticmethod
    def recover(field, shares) -> FieldElement:
        """Lagrange recovery of P(0) from >= k shares."""
        poly = Polynomial.interpolate(
            [s.x for s in shares], [s.y for s in shares]
        )
        return poly.evaluate(field(0))
