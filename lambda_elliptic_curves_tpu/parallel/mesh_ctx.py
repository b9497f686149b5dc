"""Ambient device-mesh context: the TPU-idiomatic way to turn the WHOLE
prover into a multi-chip program without threading a mesh through every
call site.

``with mesh_context(mesh):`` makes the bulk primitives mesh-aware:

* every standard-root NTT in :mod:`..poly.ntt` (``fft`` / ``ifft`` — the
  entry points behind ``interpolate_fft`` / ``evaluate_offset_fft`` and
  the challenge-bundle componentwise wrappers) routes through the
  four-step all-to-all :func:`.ntt_sharded.sharded_ntt` whenever the size
  factors across the mesh;
* Merkle leaf hashing in :class:`...merkle.tree.MerkleTree` runs with the
  leaf axis sharded over the mesh (the tree top stays local — it is
  protocol-sized, not bulk).

This is the ``jax.sharding`` recipe writ small: annotate the data layout,
let XLA's SPMD partitioner place the collectives.  The reference has no
distributed backend at all (``README.md:35`` lists it as an aspiration);
a pod-sharded prover is where the TPU build must exceed it.

Transforms too small to split run locally (replicated) — the sharded
prove is therefore ALWAYS protocol-exact: every routing decision changes
execution placement, never values, so the proof bytes equal the
single-device prover's bit for bit (asserted in
``tests/test_sharded_stark.py``).
"""

from __future__ import annotations

from contextlib import contextmanager

# (mesh, axis_name) or None — read by poly.ntt and merkle.tree
current: tuple | None = None


@contextmanager
def mesh_context(mesh, axis_name: str = "x"):
    """Activate ``mesh`` for every eligible bulk primitive in the body."""
    global current
    prev = current
    current = None if mesh.shape[axis_name] == 1 else (mesh, axis_name)
    try:
        yield
    finally:
        current = prev


def active():
    """The (mesh, axis_name) pair, or None."""
    return current
