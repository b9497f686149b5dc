"""Merkle hashing backends (parity: ``crypto/src/merkle_tree/backends/*``).

* :class:`PoseidonBackend` — nodes are Stark252 elements
  (``TreePoseidon``, ``backends/field_element.rs:54``).
* :class:`KeccakFieldBackend` — leaf = Keccak256(element bytes BE), parent =
  Keccak256(left||right) (``FieldElementBackend`` + ``Keccak256Backend``
  alias, ``backends/field_element.rs:15``, ``backends/types.rs``).
* :class:`KeccakBatchBackend` — leaf = Keccak256 of a whole row of elements,
  for committing trace rows (``field_element_vector.rs`` batch backends).

All leaf/parent layers hash on device in one batched call; single-node
host helpers back proof verification.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.field import PrimeField
from ..fields.zoo import Stark252
from ..hashes import keccak, poseidon
from .tree import MerkleBackend

U32 = jnp.uint32


def _felt_to_le_words_be_bytes(field: PrimeField, arr):
    """(K, *B) 16-bit digits -> (num_bytes/4, *B) uint32 little-endian words
    of the big-endian byte serialization (ByteConversion convention)."""
    nb = field.params.num_bytes
    K = field.num_digits
    words = []
    for w in range(nb // 4):
        word = jnp.zeros(arr.shape[1:], U32)
        for t in range(4):
            byte_index = nb - 1 - (4 * w + t)  # byte significance (LE index)
            digit = byte_index // 2
            shift = 8 * (byte_index % 2)
            if digit < K:
                byte = (arr[digit] >> U32(shift)) & U32(0xFF)
                word = word | (byte << U32(8 * t))
        words.append(word)
    return jnp.stack(words)


class PoseidonBackend(MerkleBackend):
    """Nodes are Stark252 field elements; hashing is batched Poseidon."""

    field = Stark252

    def hash_leaves(self, leaves):
        # leaves: (K, B) Montgomery digits
        return poseidon.hash_single(leaves)

    def hash_parents(self, level):
        return poseidon.hash_pairs(level[:, 0::2], level[:, 1::2])

    def pad_to_power_of_two(self, nodes):
        n = nodes.shape[-1]
        target = 1 << (n - 1).bit_length() if n > 1 else 1
        if target == n:
            return nodes
        reps = jnp.repeat(nodes[:, -1:], target - n, axis=-1)
        return jnp.concatenate([nodes, reps], axis=-1)

    def count(self, nodes):
        return nodes.shape[-1]

    def to_host(self, nodes):
        return [int(v) for v in self.field.to_ints(nodes)]

    # host single-node path (proof verification)
    def hash_leaf_host(self, value):
        return poseidon.hash_single_host(self.field(value)).value

    def hash_parent_host(self, left, right):
        return poseidon.hash_host(self.field(left), self.field(right)).value


class KeccakFieldBackend(MerkleBackend):
    """Keccak256 over canonical big-endian element bytes; nodes are 32-byte
    digests (device form: (8, B) uint32 LE words)."""

    def __init__(self, field: PrimeField):
        self.field = field

    def hash_leaves(self, leaves):
        from ..ops import limbs

        canonical = limbs.from_mont(leaves, self.field.params)
        words = _felt_to_le_words_be_bytes(self.field, canonical)
        return keccak.keccak256_words(words, self.field.params.num_bytes)

    def hash_parents(self, level):
        # level: (8, B) digests; parent input = left||right = 64 bytes
        left = level[:, 0::2]
        right = level[:, 1::2]
        words = jnp.concatenate([left, right], axis=0)
        return keccak.keccak256_words(words, 64)

    def pad_to_power_of_two(self, nodes):
        n = nodes.shape[-1]
        target = 1 << (n - 1).bit_length() if n > 1 else 1
        if target == n:
            return nodes
        reps = jnp.repeat(nodes[:, -1:], target - n, axis=-1)
        return jnp.concatenate([nodes, reps], axis=-1)

    def count(self, nodes):
        return nodes.shape[-1]

    def to_host(self, nodes):
        return keccak.digest_words_to_bytes(nodes)

    def hash_leaf_host(self, value):
        fe = self.field(value)
        return keccak.keccak256(fe.to_bytes_be())

    def hash_parent_host(self, left: bytes, right: bytes):
        return keccak.keccak256(left + right)


class KeccakBatchBackend(KeccakFieldBackend):
    """Leaf = Keccak256 of a full row of elements (trace-row commitments,
    parity with ``BatchedMerkleTreeBackend``, ``field_element_vector.rs``)."""

    def hash_leaves(self, leaves):
        """``leaves``: (K, ncols, B) Montgomery digits; row b serializes as
        col0||col1||...  in big-endian bytes."""
        from ..ops import limbs

        K, ncols = leaves.shape[0], leaves.shape[1]
        canonical = limbs.from_mont(
            leaves.reshape(K, -1), self.field.params
        ).reshape(leaves.shape)
        words = jnp.concatenate(
            [
                _felt_to_le_words_be_bytes(self.field, canonical[:, c])
                for c in range(ncols)
            ],
            axis=0,
        )
        return keccak.keccak256_words(words, self.field.params.num_bytes * ncols)

    def hash_leaf_host(self, row):
        data = b"".join(self.field(v).to_bytes_be() for v in row)
        return keccak.keccak256(data)
