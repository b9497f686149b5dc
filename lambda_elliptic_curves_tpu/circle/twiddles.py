"""CFFT twiddles (parity: ``math/src/circle/twiddles.rs:14``)."""

from __future__ import annotations

from .cosets import Coset
from .point import M31


def get_twiddles(domain: Coset, config: str = "evaluation") -> list:
    """Layered twiddles: ys of the half coset, then xs of its first half,
    then repeated 2x^2-1 squarings; inverted for interpolation, reversed
    for evaluation."""
    half_points = Coset.half_coset(domain).points()
    twiddles = [[p.y for p in half_points]]
    if domain.log_2_size >= 2:
        twiddles.append([p.x for p in half_points[: len(half_points) // 2]])
        for _ in range(domain.log_2_size - 2):
            prev = twiddles[-1]
            twiddles.append([
                (2 * x * x - 1) % M31 for x in prev[: len(prev) // 2]
            ])
    if config == "interpolation":
        return [[pow(t, -1, M31) for t in layer] for layer in twiddles]
    return list(reversed(twiddles))
