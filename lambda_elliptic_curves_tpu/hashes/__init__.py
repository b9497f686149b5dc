"""Hash functions: Keccak-256, Poseidon (Starknet), Pedersen, Rescue Prime
Optimized, Monolith, SHA-3 wrappers, hash_to_field."""

from . import keccak, poseidon, sha3  # noqa: F401
from .hash_to_field import hash_to_field  # noqa: F401
from .monolith import MonolithMersenne31  # noqa: F401
from .pedersen import pedersen_hash  # noqa: F401
from .rescue_prime import RescuePrimeOptimized  # noqa: F401
