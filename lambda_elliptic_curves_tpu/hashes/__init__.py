"""Hash functions: Keccak-256, Poseidon (Starknet), and friends."""

from . import keccak, poseidon  # noqa: F401
