"""Polynomials: dense univariate (host + device), NTT/FFT, multilinear."""

from .polynomial import Polynomial, field_sum, evaluate_coeffs_at  # noqa: F401
from . import ntt  # noqa: F401
