"""Sharded STARK round 1: trace interpolation, coset LDE and Merkle
commitment over a device mesh.

This is the bulk of STARK proving wall-time (SURVEY §3.1 round_1 —
``prover.rs:208`` interpolate_and_commit: per-column ``interpolate_fft``,
``evaluate_offset_fft`` on the LDE coset, batched Merkle).  The reference
parallelises it with rayon on one host (``prover.rs:316``); here the two
NTT stages ride the four-step all-to-all (:func:`.ntt_sharded.sharded_ntt`
— the only explicit cross-chip exchange), while leaf hashing and the tree
reduction are written as global-array ops with a sharding constraint on
the leaf axis, letting XLA's SPMD partitioner place the (tiny) top-of-tree
collectives.

All C trace columns ride ONE compiled sharded transform per stage (the
batch dim support of :func:`.ntt_sharded.sharded_ntt`), and the commit
program is memoized per (field, shape, mesh) — so repeated round-1 calls
(tests, the driver dryrun, every prove) reuse executables.

The committed root is bit-for-bit the single-device
``MerkleTree.build(KeccakBatchBackend(f), lde_br)`` root, so proofs opened
against it verify with the unchanged verifier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..merkle.backends import KeccakBatchBackend
from ..poly import ntt
from .ntt_sharded import sharded_ntt, splittable


def sharded_trace_lde(field, trace_cols, mesh: Mesh, blowup: int = 4,
                      coset_offset: int = 3, axis_name: str = "x"):
    """(K, C, n) trace columns -> (K, C, N) bit-reversed LDE evaluations,
    with both NTT passes sharded over ``mesh``.

    Matches ``ntt.bit_reverse_permute(ntt.evaluate_offset_fft(
    ntt.interpolate_fft(trace), blowup, n, offset))`` exactly.
    """
    K, C, n = trace_cols.shape
    N = n * blowup
    D = mesh.shape[axis_name]

    # interpolate all columns in one batched sharded inverse NTT;
    # transforms too small for the D-way four-step run locally — the
    # sharded commit below still spreads the leaf hashing
    if splittable(n, D):
        tpolys = sharded_ntt(field, trace_cols, mesh, axis_name,
                             ordering="natural", inverse=True)
    else:
        tpolys = ntt.interpolate_fft(field, trace_cols)

    # offset-scale + zero-pad (local elementwise), then forward NTT at N
    offs = ntt.powers(field, coset_offset % field.p, n)  # (K, n)
    scaled = field.mul(tpolys, jnp.broadcast_to(offs[:, None], tpolys.shape))
    padded = jnp.concatenate(
        [scaled, jnp.zeros((K, C, N - n), jnp.uint32)], axis=-1)
    if splittable(N, D):
        lde = sharded_ntt(field, padded, mesh, axis_name, ordering="natural")
    else:
        root = field.params.primitive_root_of_unity(N.bit_length() - 1)
        lde = ntt.fft_with_root(padded, field, root)
    return ntt.bit_reverse_permute(lde)


@functools.lru_cache(maxsize=None)
def _compiled_leaf_hash(field, mesh, axis_name):
    backend = KeccakBatchBackend(field)
    leaf_spec = NamedSharding(mesh, P(None, axis_name))

    @jax.jit
    def _leaves(arr):
        arr = jax.lax.with_sharding_constraint(
            arr, NamedSharding(mesh, P(None, None, axis_name)))
        nodes = backend.hash_leaves(arr)  # (8 words, N)
        return jax.lax.with_sharding_constraint(nodes, leaf_spec)

    return _leaves


def sharded_commit(field, lde_br, mesh: Mesh, axis_name: str = "x"):
    """Batched-row Keccak Merkle commitment of (K, C, N) bit-reversed LDE
    columns, leaf axis sharded over the mesh.  Returns
    ``(root_bytes, levels)`` with the same root as the single-device
    ``MerkleTree.build``.

    Leaf hashing — the O(N) bulk — runs as one sharded device program;
    the parent levels reuse the single-device tree builder (native-C host
    keccak when available, per-level cached device programs otherwise),
    exactly like ``MerkleTree.build`` — fusing log2(N) keccak levels into
    the sharded program compiled for minutes on 1-core rigs for no
    runtime win (the tree top is protocol-sized, not bulk)."""
    from ..merkle import MerkleTree

    backend = KeccakBatchBackend(field)
    hashed = _compiled_leaf_hash(field, mesh, axis_name)(lde_br)
    tree = MerkleTree.from_leaf_digests(backend, hashed)
    return tree.root, tree.levels


def sharded_round1(field, trace_cols, mesh: Mesh, blowup: int = 4,
                   coset_offset: int = 3, axis_name: str = "x"):
    """Full sharded round 1: trace columns -> (root, lde_br).

    ``root`` equals the single-device prover's main-tree root for the
    same trace/options (tested in ``tests/test_sharded_stark.py``).
    """
    lde_br = sharded_trace_lde(field, trace_cols, mesh, blowup,
                               coset_offset, axis_name)
    root, _levels = sharded_commit(field, lde_br, mesh, axis_name)
    return root, lde_br


def sharded_prove(air_class, trace, pub_inputs, proof_options, transcript,
                  mesh: Mesh, axis_name: str = "x"):
    """Full STARK prove with ALL rounds mesh-sharded (VERDICT r3 item 5;
    north star SURVEY §7 steps 5 & 8 — the reference has no distributed
    backend to match, ``README.md:35``).

    Uses the ambient :mod:`.mesh_ctx`: every standard-root NTT (round-1
    trace interpolation + LDE, round-2 composition interpolate/evaluate,
    round-4 DEEP interpolation and per-layer FRI evaluations) rides the
    four-step all-to-all when its size factors across the mesh, and every
    Merkle leaf-hash storm (main/aux/composition trees) runs with the
    leaf axis sharded.  Constraint evaluation is elementwise over the LDE
    and inherits the sharded layout.  Placement-only routing: the
    returned proof is bit-for-bit the single-device proof.
    """
    from ..provers.stark.prover import prove
    from . import mesh_ctx

    with mesh_ctx.mesh_context(mesh, axis_name):
        return prove(air_class, trace, pub_inputs, proof_options,
                     transcript)
