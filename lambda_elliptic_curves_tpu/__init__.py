"""lambda_elliptic_curves_tpu — a TPU-native ZK-cryptography framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
lambdaworks Rust workspace (finite fields, elliptic curves & pairings,
NTT/FFT, MSM, hashes, Merkle trees, polynomial commitments, and the
STARK / Plonk / Groth16 proof systems).

Design principles (TPU-first, not a port):

* Fields are *data layouts + kernel sets*: a prime-field element is a
  little-endian vector of 16-bit digits stored in ``uint32`` lanes, and all
  bulk arithmetic is batched elementwise VPU work (or MXU work for limb
  convolutions) expressed in jnp/Pallas.  There is no per-element object on
  the device path.
* Every protocol also has an exact host path over Python integers used for
  transcript glue, pairings-for-verification and as the testing oracle.
* Parallelism is SPMD over a ``jax.sharding.Mesh`` (all-to-all NTT,
  bucket-sharded MSM), never thread pools.

Reference capability map: see SURVEY.md at the repository root; citations in
docstrings point into the lambdaworks sources (``/root/reference``) only to
document parity, the implementations here are new.
"""

__version__ = "0.1.0"

from . import fields  # noqa: F401
from .fields import Stark252  # noqa: F401


def Felt252(value):
    """Stark252 host element constructor (``Felt252`` alias parity,
    ``provers/stark/src/lib.rs:27``)."""
    return Stark252(value)
