"""Shared utilities: errors, serialization helpers."""

from . import errors  # noqa: F401
