"""Example applications (parity: ``examples/``): Shamir secret sharing,
Merkle tree CLI, BabySNARK, Pinocchio."""
