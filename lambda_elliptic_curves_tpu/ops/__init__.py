"""Compute primitives: batched digit arithmetic and Pallas TPU kernels."""

from . import limbs  # noqa: F401
