"""Polynomial commitment schemes (KZG)."""

from .kzg import KateZaveruchaGoldberg, StructuredReferenceString  # noqa: F401
