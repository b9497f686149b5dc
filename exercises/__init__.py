"""Broken-crypto exercises (parity role: the reference's ``exercises/``
workspace — deliberately vulnerable protocol code to attack).

Each module implements a small protocol with one classic implementation
flaw; the attacks live in ``tests/test_exercises.py`` and double as
regression tests that the *real* framework components do not share the
flaw.

* :mod:`exercises.blind_trust`   — Fiat–Shamir challenge that does not
  bind the commitment: universal signature forgery.
* :mod:`exercises.broken_heart`  — nonce reuse in Schnorr: key recovery
  from two signatures.
* :mod:`exercises.leaky_shamir`  — secret sharing with a short, biased
  polynomial: recovery below the threshold.
* :mod:`exercises.mutable_leaves` — Merkle verification without
  leaf/node domain separation: inner nodes forge as leaves.
* :mod:`exercises.toxic_waste`   — KZG ceremony with a low-entropy
  trapdoor seed: recover tau, open any commitment to any value.
"""
