"""Proof systems: STARK (stark-platinum), Plonk, Groth16."""
