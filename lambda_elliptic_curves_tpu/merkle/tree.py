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


_fused_levels_cache: dict = {}

# levels at or below this node count fuse into one "tree top" program;
# bigger levels run as per-shape cached dispatches.  The cap bounds
# compile cost: every tree with >= _FUSE_CAP leaves shares ONE top
# program (plus a handful of per-level programs whose shapes repeat
# across trees), where fusing whole trees compiled a fresh multi-minute
# program per distinct leaf count (15 FRI layers = 15 programs, measured
# 986 s cold prove at 2^16).
_FUSE_CAP = 8192


def _fused_device_levels(backend: MerkleBackend, hashed):
    """Parent levels with a bounded-compile fusion strategy: levels above
    ``_FUSE_CAP`` nodes hash as individual cached dispatches (shapes
    recur across trees and FRI layers, so each compiles once per
    process), everything from the cap down to the root runs as ONE
    jitted tree-top program shared by every tree that reaches the cap.
    Dispatch latency still collapses (a 2^18-leaf tree is 6 dispatches +
    1, vs 18), without the per-tree compile blowup of full fusion.

    Only backends that opt in (``fuse_tree_levels = True``) take this
    path: cheap-permutation digests (keccak/sha) fuse into a compact
    program, while wide-round-count permutations (Poseidon hades) made
    whole-tree programs multi-minute compiles (round-3 regression)."""
    step = _parent_step(backend)
    levels = [hashed]
    while backend.count(levels[-1]) > _FUSE_CAP:
        levels.append(step(levels[-1]))
    top = levels[-1]
    if backend.count(top) == 1:
        return levels
    key = (type(backend), getattr(backend, "field", None),
           getattr(backend, "cache_key", None), tuple(top.shape))
    fn = _fused_levels_cache.get(key)
    if fn is None:

        def run(leaves, _b=backend):
            out = []
            cur = leaves
            while _b.count(cur) > 1:
                cur = _b.hash_parents(cur)
                out.append(cur)
            return tuple(out)

        fn = _fused_levels_cache[key] = jax.jit(run)
    return levels + list(fn(top))


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
        jitted program (e.g. the FRI layer step).

        Route choice is a transfer/dispatch trade: on accelerators the
        fused device build costs ONE dispatch and keeps every level on
        device (proofs later gather only the nodes they need), while the
        native-C host build pays a full leaf-digest transfer (8 MB at
        2^18) through a possibly-tunneled link.  On CPU the host build is
        local and wins."""
        hashed = backend.pad_to_power_of_two(hashed)
        fuse = (getattr(backend, "fuse_tree_levels", False)
                and jax.default_backend() != "cpu")
        if not fuse:
            host_builder = getattr(backend, "build_parents_host", None)
            if host_builder is not None:
                host_levels = host_builder(hashed)
                if host_levels is not None:
                    return cls(backend, host_levels)
        levels = (_fused_device_levels(backend, hashed) if fuse
                  else _device_levels(backend, hashed))
        tree = cls(backend, [LazyLevel(backend, lvl) for lvl in levels])
        tree._dev_levels = levels
        return tree

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

    # (backend type/config, level shapes, Q) -> jitted path gather
    _gather_cache: dict = {}

    def gather_proofs(self, positions) -> list:
        """Sibling paths for MANY leaves with ONE device round trip.

        For device-level trees, per-query host indexing through
        :class:`LazyLevel` transfers every touched level in full (MBs per
        tree over a tunneled link).  Here the sibling indices for all Q
        queries are computed host-side, every level is gathered with one
        ``jnp.take`` inside one jitted program, and the packed
        (node_dims..., L*Q) result transfers once (kilobytes).  Falls back
        to per-position walks for host-level trees."""
        positions = [int(p) for p in positions]
        dev_levels = getattr(self, "_dev_levels", None)
        if dev_levels is None or len(dev_levels) <= 1:
            return [self.get_proof_by_pos(p) for p in positions]
        backend = self.backend
        Q = len(positions)
        idx_rows = []
        idx = positions
        for lvl in dev_levels[:-1]:
            n = backend.count(lvl)
            idx_rows.append(
                np.asarray([min(i ^ 1, n - 1) for i in idx], np.int32))
            idx = [i >> 1 for i in idx]
        key = (type(backend), getattr(backend, "field", None),
               getattr(backend, "cache_key", None),
               tuple(tuple(lvl.shape) for lvl in dev_levels), Q)
        fn = self._gather_cache.get(key)
        if fn is None:

            def run(levels, rows):
                return jnp.concatenate(
                    [jnp.take(lvl, r, axis=-1)
                     for lvl, r in zip(levels, rows)], axis=-1)

            fn = self._gather_cache[key] = jax.jit(run)
        packed = fn(tuple(dev_levels[:-1]),
                    tuple(jnp.asarray(r) for r in idx_rows))
        mat = backend.level_to_np(packed)
        L = len(dev_levels) - 1
        return [
            Proof(merkle_path=[
                backend.node_from_np(mat, lvl * Q + q) for lvl in range(L)
            ])
            for q in range(Q)
        ]
