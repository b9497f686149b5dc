"""Circle polynomial evaluation/interpolation
(parity: ``math/src/circle/polynomial.rs:18,42``): coefficients in the
basis {1, y, x, xy, 2x^2-1, (2x^2-1)y, ...} over the standard coset."""

from __future__ import annotations

from .cfft import (
    bit_reverse, cfft, icfft, order_cfft_result, order_icfft_input,
)
from .cosets import Coset
from .point import M31
from .twiddles import get_twiddles


def evaluate_cfft(coeff: list) -> list:
    """Coefficients -> evaluations on the standard coset (natural order)."""
    n = len(coeff)
    coset = Coset.new_standard(n.bit_length() - 1)
    twiddles = get_twiddles(coset, "evaluation")
    permuted = bit_reverse([c % M31 for c in coeff])
    return order_cfft_result(cfft(permuted, twiddles))


def interpolate_cfft(evals: list) -> list:
    """Evaluations on the standard coset -> coefficients."""
    if not evals:
        return []
    n = len(evals)
    coset = Coset.new_standard(n.bit_length() - 1)
    twiddles = get_twiddles(coset, "interpolation")
    ordered = order_icfft_input([e % M31 for e in evals])
    out = bit_reverse(icfft(ordered, twiddles))
    factor = pow(n, -1, M31)
    return [v * factor % M31 for v in out]
