"""Merkle trees with batched device hashing.

Parity: ``MerkleTree::build`` / ``get_proof_by_pos`` / ``Proof::verify``
(``crypto/src/merkle_tree/merkle.rs:33,58``, ``proof.rs:20``) and the
backend trait ``IsMerkleTreeBackend`` (``traits.rs:8``).

TPU-native design: the reference parallelises leaf hashing with rayon and
builds parents level-by-level on the CPU; here *every level is one batched
device hash call* (Poseidon or Keccak over a (.., B) array), so the whole
build is log2(n) kernel launches.  Nodes are then pulled to the host once,
where proofs are O(log n) indexing — proofs are protocol-sized, not bulk.

Unbalanced inputs are padded by repeating the last leaf (same convention as
the reference's ``complete_until_power_of_two``, ``merkle.rs`` helpers).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


class MerkleBackend:
    """A hashing backend: how to hash leaf data and how to merge nodes.

    Node representation is backend-defined:
    * Poseidon backend — nodes are Stark252 elements (ints on host).
    * Keccak backends — nodes are 32-byte digests.
    """

    def hash_leaves(self, leaves):
        raise NotImplementedError

    def hash_parents(self, level):
        raise NotImplementedError

    def to_host(self, nodes) -> list:
        raise NotImplementedError


@dataclasses.dataclass
class Proof:
    """Inclusion proof: sibling path bottom-up (``proof.rs:15``)."""

    merkle_path: list

    def verify(self, backend: MerkleBackend, root, index: int, value) -> bool:
        """Rebuild the root walking the sibling path (``proof.rs:20``)."""
        node = backend.hash_leaf_host(value)
        for sibling in self.merkle_path:
            if index % 2 == 0:
                node = backend.hash_parent_host(node, sibling)
            else:
                node = backend.hash_parent_host(sibling, node)
            index //= 2
        return node == root


class LazyLevel:
    """Host view of one device-resident tree level.

    The digit/word matrix transfers once on first access (no per-node
    device indexing — that would compile a fresh XLA program per index);
    individual nodes convert to host values on demand, so building a tree
    never pays a bulk value conversion for nodes no proof ever touches."""

    def __init__(self, backend: MerkleBackend, nodes):
        self._backend = backend
        self._nodes = nodes
        self._np = None

    def _mat(self):
        if self._np is None:
            self._np = self._backend.level_to_np(self._nodes)
            self._nodes = None
        return self._np

    def __len__(self):
        mat = self._np
        return (mat.shape[-1] if mat is not None
                else self._backend.count(self._nodes))

    def __getitem__(self, i: int):
        return self._backend.node_from_np(self._mat(), i)


_parent_fn_cache: dict = {}


def _parent_step(backend: MerkleBackend):
    """One jitted parent-hash program per backend config.  jax.jit caches
    per input shape internally, so every tree SHARES the per-level
    executables: a 2^16 tree and the 2^15 FRI-layer tree reuse all common
    level shapes instead of each compiling a fused whole-tree program
    (which unrolls log2(n) permutations into one module and compiles for
    minutes at 2^16 — the round-3 regression)."""
    key = (type(backend), getattr(backend, "field", None),
           getattr(backend, "cache_key", None))
    fn = _parent_fn_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda lv, _b=backend: _b.hash_parents(lv))
        _parent_fn_cache[key] = fn
    return fn


def _device_levels(backend: MerkleBackend, hashed):
    """All parent levels as log2(n) batched device hash calls (the
    reference builds the same levels on CPU with rayon leaf hashing,
    ``crypto/src/merkle_tree/merkle.rs:33``); each level is one dispatch
    of the shared per-shape parent program."""
    step = _parent_step(backend)
    levels = [hashed]
    while backend.count(levels[-1]) > 1:
        levels.append(step(levels[-1]))
    return levels


class MerkleTree:
    """levels[0] = leaf hashes, levels[-1] = [root].

    Levels are host lists (native-C keccak path) or :class:`LazyLevel`
    device views (generic path) — both index the same way."""

    def __init__(self, backend: MerkleBackend, levels: list):
        self.backend = backend
        self.levels = levels

    @classmethod
    def build(cls, backend: MerkleBackend, leaves):
        """``leaves``: backend-specific batched device array(s).

        Leaf hashing is one batched device call; parent levels prefer the
        backend's native host path (one transfer + one C call), else build
        in one fused device program with lazy host views.

        Under an active ``parallel.mesh_ctx`` mesh the leaf axis is
        sharded first, so the O(n) leaf-hash bulk runs distributed (the
        tree top is protocol-sized and stays local)."""
        from ..parallel import mesh_ctx

        import jax

        ctx = mesh_ctx.active()
        if (ctx is not None
                and not isinstance(leaves, jax.core.Tracer)
                and leaves.shape[-1] % ctx[0].shape[ctx[1]] == 0):
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh, ax = ctx
            spec = P(*([None] * (leaves.ndim - 1)), ax)
            leaves = jax.device_put(leaves, NamedSharding(mesh, spec))
        return cls.from_leaf_digests(backend, backend.hash_leaves(leaves))

    @classmethod
    def from_leaf_digests(cls, backend: MerkleBackend, hashed):
        """Build from already-hashed leaves (a device digest array) — the
        entry point for fused pipelines that hash leaves inside a larger
        jitted program (e.g. the FRI layer step)."""
        hashed = backend.pad_to_power_of_two(hashed)
        host_builder = getattr(backend, "build_parents_host", None)
        if host_builder is not None:
            host_levels = host_builder(hashed)
            if host_levels is not None:
                return cls(backend, host_levels)
        levels = _device_levels(backend, hashed)
        return cls(backend, [LazyLevel(backend, lvl) for lvl in levels])

    @property
    def root(self):
        return self.levels[-1][0]

    def get_proof_by_pos(self, pos: int) -> Proof:
        """Sibling path for leaf ``pos`` (``merkle.rs:58``)."""
        path = []
        idx = pos
        for level in self.levels[:-1]:
            sibling = idx ^ 1
            path.append(level[min(sibling, len(level) - 1)])
            idx //= 2
        return Proof(merkle_path=path)
