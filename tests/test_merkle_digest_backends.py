"""Digest-generic Merkle backends (parity: ``backends/types.rs`` alias zoo —
Sha3-256/512, Keccak-256/512, Sha2-256/512, plus the vector-of-FE Batch*
variants from ``field_element_vector.rs``).

Each device tree is checked against a pure-host build using stdlib hashlib
(or the host sponge for legacy keccak), so the batched device sponges and
the SHA-2 compression kernels are differentially verified end-to-end.
"""

import hashlib

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.fields import Stark252
from lambda_elliptic_curves_tpu.hashes import keccak
from lambda_elliptic_curves_tpu.merkle import (
    DigestBatchBackend, DigestFieldBackend, MerkleTree,
)

ALGOS = ["keccak256", "keccak512", "sha3_256", "sha3_512", "sha2_256",
         "sha2_512"]

HOST = {
    "keccak256": keccak.keccak256,
    "keccak512": keccak.keccak512,
    "sha3_256": lambda d: hashlib.sha3_256(d).digest(),
    "sha3_512": lambda d: hashlib.sha3_512(d).digest(),
    "sha2_256": lambda d: hashlib.sha256(d).digest(),
    "sha2_512": lambda d: hashlib.sha512(d).digest(),
}


def _host_root(hash_fn, leaf_blobs):
    nodes = [hash_fn(b) for b in leaf_blobs]
    while len(nodes) > 1:
        nodes = [hash_fn(nodes[2 * i] + nodes[2 * i + 1])
                 for i in range(len(nodes) // 2)]
    return nodes[0]


@pytest.mark.parametrize("algo", ALGOS)
def test_digest_field_backend_tree(algo):
    f = Stark252
    values = [(7 * i + 3) % f.p for i in range(8)]
    leaves = f.array(values)
    backend = DigestFieldBackend(f, algo)
    tree = MerkleTree.build(backend, leaves)

    want = _host_root(HOST[algo], [f(v).as_bytes() for v in values])
    assert tree.root == want

    for pos in (0, 3, 7):
        proof = tree.get_proof_by_pos(pos)
        assert proof.verify(backend, tree.root, pos, values[pos])
    assert not tree.get_proof_by_pos(0).verify(
        backend, tree.root, 0, (values[0] + 1) % f.p)


@pytest.mark.parametrize("algo", ["sha3_256", "sha2_256", "keccak512"])
def test_digest_batch_backend_rows(algo):
    f = Stark252
    rows, cols = 4, 3
    vals = [[(11 * r + c + 1) % f.p for r in range(rows)]
            for c in range(cols)]
    leaves = f.array(vals)  # (K, cols, rows)
    backend = DigestBatchBackend(f, algo)
    tree = MerkleTree.build(backend, leaves)

    blobs = [
        b"".join(f(vals[c][r]).as_bytes() for c in range(cols))
        for r in range(rows)
    ]
    assert tree.root == _host_root(HOST[algo], blobs)

    row1 = [vals[c][1] for c in range(cols)]
    assert tree.get_proof_by_pos(1).verify(backend, tree.root, 1, row1)


def test_sha2_device_vs_hashlib_random_sizes():
    """Direct differential check of the SHA-2 device kernels on odd message
    sizes (not just the element-width ones the tree exercises)."""
    from lambda_elliptic_curves_tpu.hashes import sha2
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    for n in (31, 64, 119):
        msgs = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                for _ in range(3)]
        W = (n + 3) // 4
        arr = np.zeros((W, len(msgs)), np.uint32)
        for b, m in enumerate(msgs):
            arr[:, b] = np.frombuffer(m + b"\0" * (W * 4 - n), "<u4")
        got = np.asarray(sha2.sha256_words(jnp.asarray(arr), n)).astype("<u4")
        for b, m in enumerate(msgs):
            assert np.ascontiguousarray(got[:, b]).tobytes() == \
                hashlib.sha256(m).digest()
