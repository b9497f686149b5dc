"""Keccak-256, Poseidon, and Merkle tree tests.

KATs: Poseidon hades permutation vectors from the reference test suite
(``crypto/src/hash/poseidon/mod.rs:104-160``); Keccak-256 standard vectors.
"""

import numpy as np

from lambda_elliptic_curves_tpu.fields import Stark252
from lambda_elliptic_curves_tpu.hashes import keccak, poseidon
from lambda_elliptic_curves_tpu.merkle import (
    MerkleTree, PoseidonBackend, KeccakFieldBackend, KeccakBatchBackend,
)


def test_keccak256_host_vectors():
    # standard Keccak-256 KATs (pre-NIST padding, as used by Ethereum/Stone)
    assert keccak.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block (> 136 bytes)
    long = b"x" * 200
    assert len(keccak.keccak256(long)) == 32


def test_keccak256_device_matches_host():
    msgs = [b"", b"abc" + b"\x00" * 61, b"q" * 64]
    # device: fixed-size 64-byte messages
    data = [b"A" * 64, b"B" * 33 + b"\x00" * 31, bytes(range(64))]
    words = np.zeros((16, len(data)), np.uint32)
    for b, msg in enumerate(data):
        for i in range(16):
            words[i, b] = int.from_bytes(msg[4 * i : 4 * i + 4], "little")
    out = keccak.keccak256_words(words, 64)
    digests = keccak.digest_words_to_bytes(out)
    for msg, d in zip(data, digests):
        assert d == keccak.keccak256(msg)


def test_keccak256_device_multiblock():
    msg = bytes(range(137 * 1)) + b"\x00" * 3  # 140 bytes -> 2 blocks
    words = np.zeros((35, 1), np.uint32)
    for i in range(35):
        words[i, 0] = int.from_bytes(msg[4 * i : 4 * i + 4], "little")
    out = keccak.keccak256_words(words, 140)
    assert keccak.digest_words_to_bytes(out)[0] == keccak.keccak256(msg[:140])


def test_poseidon_host_kats():
    f = Stark252
    s = poseidon.hades_permutation_host([f(0x9), f(0xB), f(0x2)])
    assert s[0].value == int(
        "510f3a3faf4084e3b1e95fd44c30746271b48723f7ea9c8be6a9b6b5408e7e6", 16
    )
    assert s[1].value == int(
        "4f511749bd4101266904288021211333fb0a514cb15381af087462fa46e6bd9", 16
    )
    assert s[2].value == int(
        "186f6dd1a6e79cb1b66d505574c349272cd35c07c223351a0990410798bb9d8", 16
    )
    z = poseidon.hash_host(f(0x123456), f(0x789101))
    assert z.value == int(
        "2fb6e1e8838d4b850877944f0a13340dd5810f01f5d4361c54b22b4abda3248", 16
    )
    z1 = poseidon.hash_single_host(f(0x9))
    assert z1.value == int(
        "3bb3b91c714cb47003947f36dadc98326176963c434cd0a10320b8146c948b3", 16
    )


def test_poseidon_device_matches_host():
    f = Stark252
    xs = [3, 0, f.p - 1, 12345]
    ys = [7, 1, 2, 99999]
    out = f.to_ints(poseidon.hash_pairs(f.array(xs), f.array(ys)))
    for x, y, o in zip(xs, ys, out):
        assert int(o) == poseidon.hash_host(f(x), f(y)).value
    out1 = f.to_ints(poseidon.hash_single(f.array(xs)))
    for x, o in zip(xs, out1):
        assert int(o) == poseidon.hash_single_host(f(x)).value


def test_merkle_poseidon_build_and_prove():
    f = Stark252
    values = [1, 2, 3, 4, 5]  # unbalanced -> padded to 8
    backend = PoseidonBackend()
    tree = MerkleTree.build(backend, f.array(values))
    for i, v in enumerate(values):
        proof = tree.get_proof_by_pos(i)
        assert proof.verify(backend, tree.root, i, v)
    assert not tree.get_proof_by_pos(0).verify(backend, tree.root, 0, 999)


def test_merkle_keccak_field_backend():
    f = Stark252
    values = [10, 20, 30, 40]
    backend = KeccakFieldBackend(f)
    tree = MerkleTree.build(backend, f.array(values))
    assert isinstance(tree.root, bytes) and len(tree.root) == 32
    for i, v in enumerate(values):
        assert tree.get_proof_by_pos(i).verify(backend, tree.root, i, v)
    # leaf hash matches the host AsBytes wire convention (the reference
    # hashes raw Montgomery-limb bytes — montgomery_backed_prime_fields.rs:371)
    assert tree.levels[0][0] == keccak.keccak256(f(10).as_bytes())
    assert f(10).as_bytes() == (
        (10 * f.params.serialization_r % f.p).to_bytes(32, "big"))


def test_merkle_keccak_batch_backend():
    f = Stark252
    rows = [[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]]
    backend = KeccakBatchBackend(f)
    # device layout: (K, ncols, B): column-major per row
    arr = f.array([[rows[b][c] for b in range(4)] for c in range(3)])
    tree = MerkleTree.build(backend, arr)
    for i, row in enumerate(rows):
        assert tree.get_proof_by_pos(i).verify(backend, tree.root, i, row)
