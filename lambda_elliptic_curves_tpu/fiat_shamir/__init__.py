"""Fiat–Shamir transcripts."""

from .transcript import DefaultTranscript  # noqa: F401
