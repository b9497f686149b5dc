"""Fiat–Shamir transcripts."""

from .transcript import DefaultTranscript  # noqa: F401
from .stone import StoneProverTranscript  # noqa: F401
