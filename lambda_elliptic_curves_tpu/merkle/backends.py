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


def _to_wire_form(field: PrimeField, leaves):
    """Montgomery digit planes -> AsBytes wire-form digit planes.

    lambdaworks' ``AsBytes`` serializes the raw 64-bit-limb Montgomery
    value x * R_ref mod p (``montgomery_backed_prime_fields.rs:371``), so
    hashing wire bytes means multiplying the canonical value by
    ``serialization_r``.  Our internal form is x * R_int; one Montgomery
    product by the plain constant R_ref yields x * R_ref.  When
    R_ref == R_int (every 256/384-bit field) the internal digits already
    ARE the wire value and this is free — the commit path skips the
    from-Montgomery reduction entirely.
    """
    from ..ops import limbs

    fp = field.params
    if fp.serialization_r == fp.r:
        return leaves
    c = limbs.const_digits(fp.serialization_r, fp, ())
    c = c.reshape((fp.num_digits,) + (1,) * (leaves.ndim - 1))
    return limbs.mont_mul(leaves, jnp.broadcast_to(c, leaves.shape), fp)


def _felt_to_le_words_be_bytes(field: PrimeField, arr):
    """(K, *B) digit planes -> (num_bytes/4, *B) uint32 little-endian words
    of the big-endian byte serialization.

    Works for any digit width: byte b (bit range [8b, 8b+8)) is assembled
    from the (at most two) digits overlapping it, with static shifts.
    """
    nb = field.params.num_bytes
    K = field.num_digits
    dbits = field.params.digit_bits
    words = []
    for w in range(nb // 4):
        word = jnp.zeros(arr.shape[1:], U32)
        for t in range(4):
            byte_index = nb - 1 - (4 * w + t)  # byte significance (LE index)
            byte = jnp.zeros(arr.shape[1:], U32)
            for digit in range(byte_index * 8 // dbits,
                               min(K, (byte_index * 8 + 8 + dbits - 1) // dbits)):
                off = byte_index * 8 - digit * dbits  # bit offset into digit
                if off >= 0:
                    byte = byte | (arr[digit] >> U32(off))
                else:
                    byte = byte | (arr[digit] << U32(-off))
            byte = byte & U32(0xFF)
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

    # lazy-level protocol: one digit-matrix transfer, per-node int on demand
    def level_to_np(self, nodes):
        from ..ops.limbs import device_to_np

        return device_to_np(self.field._jit_from_mont(nodes))

    def node_from_np(self, mat, i: int):
        from ..ops import limbs

        return int(limbs.digits_to_ints_np(mat[:, i], self.field.params))

    # host single-node path (proof verification)
    def hash_leaf_host(self, value):
        return poseidon.hash_single_host(self.field(value)).value

    def hash_parent_host(self, left, right):
        return poseidon.hash_host(self.field(left), self.field(right)).value


class KeccakFieldBackend(MerkleBackend):
    """Keccak256 over canonical big-endian element bytes; nodes are 32-byte
    digests (device form: (8, B) uint32 LE words)."""

    # sponge rounds are cheap elementwise ops: the whole level chain fuses
    # into one compact jitted program (tree.py _fused_device_levels)
    fuse_tree_levels = True

    def __init__(self, field: PrimeField):
        self.field = field

    def hash_leaves(self, leaves):
        wire = _to_wire_form(self.field, leaves)
        words = _felt_to_le_words_be_bytes(self.field, wire)
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

    # lazy-level protocol (device-fallback trees)
    def level_to_np(self, nodes):
        from ..ops.limbs import device_to_np

        return np.ascontiguousarray(device_to_np(nodes).astype("<u4"))

    def node_from_np(self, mat, i: int):
        return mat[:, i].tobytes()

    def build_parents_host(self, hashed_leaves):
        """All levels above the (device) leaf digests via the native C
        keccak — one transfer + one ctypes call instead of log2(n) device
        dispatches and per-level transfers.  Returns host levels (leaf
        level first) or None when the native library is unavailable
        (``LWT_MERKLE_HOST=0`` forces the device path)."""
        import os

        if os.environ.get("LWT_MERKLE_HOST", "1") == "0":
            return None
        from .. import native

        if native.load() is None:
            return None
        return native.merkle_levels(self.to_host(hashed_leaves))

    def hash_leaf_host(self, value):
        return keccak.keccak256(self.field(value).as_bytes())

    def hash_parent_host(self, left: bytes, right: bytes):
        return keccak.keccak256(left + right)


class _AlgoSpec:
    """One digest algorithm: batched device words-hash + host bytes-hash."""

    def __init__(self, name, digest_bytes, words_fn, host_fn):
        self.name = name
        self.digest_bytes = digest_bytes
        self.words_fn = words_fn  # (words, msg_bytes) -> LE digest words
        self.host_fn = host_fn    # bytes -> bytes


def _algos():
    import hashlib

    from ..hashes import sha2

    def sponge(rate, pad, nbytes):
        return lambda w, m: keccak.sponge_words(w, m, rate, pad, nbytes)

    return {
        "keccak256": _AlgoSpec("keccak256", 32, sponge(136, 0x01, 32),
                               keccak.keccak256),
        "keccak512": _AlgoSpec("keccak512", 64, sponge(72, 0x01, 64),
                               keccak.keccak512),
        "sha3_256": _AlgoSpec("sha3_256", 32, sponge(136, 0x06, 32),
                              lambda d: hashlib.sha3_256(d).digest()),
        "sha3_512": _AlgoSpec("sha3_512", 64, sponge(72, 0x06, 64),
                              lambda d: hashlib.sha3_512(d).digest()),
        "sha2_256": _AlgoSpec("sha2_256", 32, sha2.sha256_words,
                              lambda d: hashlib.sha256(d).digest()),
        "sha2_512": _AlgoSpec("sha2_512", 64, sha2.sha512_words,
                              lambda d: hashlib.sha512(d).digest()),
    }


class DigestFieldBackend(MerkleBackend):
    """Digest-generic field-element backend — parity with the reference's
    ``FieldElementBackend<F, D, NUM_BYTES>`` over any RustCrypto digest
    (``backends/field_element.rs:15``) and the alias zoo in
    ``backends/types.rs`` (Sha3-256/512, Keccak-256/512, Sha2-256/512).

    Device nodes are (digest_bytes/4, B) uint32 little-endian words of the
    digest byte stream; every algorithm hashes whole levels in one batched
    device call (keccak-family via the shared sponge, SHA-2 via
    :mod:`..hashes.sha2`).
    """

    fuse_tree_levels = True  # sponge/SHA rounds fuse compactly (tree.py)

    def __init__(self, field: PrimeField, algo: str = "keccak256"):
        self.field = field
        self.algo = _algos()[algo]
        self.cache_key = algo  # distinct jitted tree builders per digest

    def hash_leaves(self, leaves):
        wire = _to_wire_form(self.field, leaves)
        words = _felt_to_le_words_be_bytes(self.field, wire)
        return self.algo.words_fn(words, self.field.params.num_bytes)

    def hash_parents(self, level):
        left = level[:, 0::2]
        right = level[:, 1::2]
        words = jnp.concatenate([left, right], axis=0)
        return self.algo.words_fn(words, 2 * self.algo.digest_bytes)

    pad_to_power_of_two = KeccakFieldBackend.pad_to_power_of_two
    count = KeccakFieldBackend.count
    level_to_np = KeccakFieldBackend.level_to_np
    node_from_np = KeccakFieldBackend.node_from_np

    def to_host(self, nodes):
        from ..ops.limbs import device_to_np

        arr = np.ascontiguousarray(
            device_to_np(nodes).astype("<u4").reshape(nodes.shape[0], -1).T)
        nb = self.algo.digest_bytes
        buf = arr.tobytes()
        return [buf[nb * b: nb * (b + 1)] for b in range(arr.shape[0])]

    def hash_leaf_host(self, value):
        return self.algo.host_fn(self.field(value).as_bytes())

    def hash_parent_host(self, left: bytes, right: bytes):
        return self.algo.host_fn(left + right)

    def build_parents_host(self, hashed_leaves):
        """keccak256 trees reuse the native C parent-level fast path (same
        digest layout as :class:`KeccakFieldBackend`); other digests build
        parents on device."""
        if self.algo.name != "keccak256":
            return None
        return KeccakFieldBackend.build_parents_host(self, hashed_leaves)


class DigestBatchBackend(DigestFieldBackend):
    """Digest-generic vector-of-FE backend: leaf = D(row of elements) —
    parity with ``FieldElementVectorBackend`` (``field_element_vector.rs``)
    and the Batch* aliases in ``backends/types.rs``."""

    def hash_leaves(self, leaves):
        K, ncols = leaves.shape[0], leaves.shape[1]
        wire = _to_wire_form(
            self.field, leaves.reshape(K, -1)
        ).reshape(leaves.shape)
        words = jnp.concatenate(
            [
                _felt_to_le_words_be_bytes(self.field, wire[:, c])
                for c in range(ncols)
            ],
            axis=0,
        )
        return self.algo.words_fn(
            words, self.field.params.num_bytes * ncols)

    def hash_leaf_host(self, row):
        data = b"".join(self.field(v).as_bytes() for v in row)
        return self.algo.host_fn(data)


class RescuePrimeBackend(MerkleBackend):
    """RPO Merkle backend over Goldilocks — parity with the reference's
    use of ``RescuePrimeOptimized`` for bulk hashing
    (``rescue_prime_optimized.rs:192,205``).  Nodes are RPO digests =
    ``rate/2`` Goldilocks elements, device layout ``(K, D, B)``; leaves
    are rows of elements (vector-of-FE convention) hashed by the batched
    device sponge (:mod:`..hashes.rescue_prime_device`), with the host
    class as the per-node proof-verification oracle."""

    def __init__(self, security_level: int = 128):
        from ..fields.zoo import Goldilocks
        from ..hashes import rescue_prime, rescue_prime_device

        self.field = Goldilocks
        self.level = security_level
        self.cache_key = f"rpo{security_level}"
        self._dev = rescue_prime_device
        self._host = rescue_prime.RescuePrimeOptimized(security_level)
        self.digest_elems = self._host.rate // 2

    def hash_leaves(self, leaves):
        # (K, B) single elements or (K, ncols, B) rows
        if leaves.ndim == 2:
            leaves = leaves[:, None, :]
        return self._dev.hash_elements_words(leaves, self.level)

    def hash_parents(self, level):
        # (K, D, B): children 2i, 2i+1 concatenate to a 2D-element message
        left = level[:, :, 0::2]
        right = level[:, :, 1::2]
        return self._dev.hash_elements_words(
            jnp.concatenate([left, right], axis=1), self.level)

    def pad_to_power_of_two(self, nodes):
        n = nodes.shape[-1]
        target = 1 << (n - 1).bit_length() if n > 1 else 1
        if target == n:
            return nodes
        reps = jnp.repeat(nodes[..., -1:], target - n, axis=-1)
        return jnp.concatenate([nodes, reps], axis=-1)

    def count(self, nodes):
        return nodes.shape[-1]

    def to_host(self, nodes):
        from ..ops.limbs import device_to_np

        mat = device_to_np(self.field._jit_from_mont(nodes))
        return [self.node_from_np(mat, i) for i in range(mat.shape[-1])]

    def level_to_np(self, nodes):
        from ..ops.limbs import device_to_np

        return device_to_np(self.field._jit_from_mont(nodes))

    def node_from_np(self, mat, i: int):
        from ..ops import limbs

        return tuple(
            int(limbs.digits_to_ints_np(mat[:, d, i], self.field.params))
            for d in range(mat.shape[1])
        )

    def hash_leaf_host(self, row):
        vals = [int(v) for v in (row if isinstance(row, (list, tuple))
                                 else [row])]
        return tuple(self._host.hash(vals))

    def hash_parent_host(self, left, right):
        return tuple(self._host.hash(list(left) + list(right)))


class KeccakBatchBackend(KeccakFieldBackend):
    """Leaf = Keccak256 of a full row of elements (trace-row commitments,
    parity with ``BatchedMerkleTreeBackend``, ``field_element_vector.rs``)."""

    def hash_leaves(self, leaves):
        """``leaves``: (K, ncols, B) Montgomery digits; row b serializes as
        col0||col1||...  in big-endian AsBytes (wire-form) bytes."""
        K, ncols = leaves.shape[0], leaves.shape[1]
        wire = _to_wire_form(
            self.field, leaves.reshape(K, -1)
        ).reshape(leaves.shape)
        words = jnp.concatenate(
            [
                _felt_to_le_words_be_bytes(self.field, wire[:, c])
                for c in range(ncols)
            ],
            axis=0,
        )
        return keccak.keccak256_words(words, self.field.params.num_bytes * ncols)

    def hash_leaf_host(self, row):
        data = b"".join(self.field(v).as_bytes() for v in row)
        return keccak.keccak256(data)
