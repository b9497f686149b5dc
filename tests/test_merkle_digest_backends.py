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


def _words_of(msgs, n):
    import jax.numpy as jnp

    W = (n + 3) // 4
    arr = np.zeros((W, len(msgs)), np.uint32)
    for b, m in enumerate(msgs):
        arr[:, b] = np.frombuffer(m + b"\0" * (W * 4 - n), "<u4")
    return jnp.asarray(arr)


@pytest.mark.parametrize("n", [31, 71, 72, 112, 128])
def test_wide_digests_device_vs_host_block_boundaries(n):
    """sha512 and the rate-72 sponges (keccak-512 / sha3-512) at
    block-boundary and non-word-aligned sizes — the tree tests only hit
    element-width multiples (32/128 bytes)."""
    from lambda_elliptic_curves_tpu.hashes import sha2
    import jax.numpy as jnp  # noqa: F401

    rng = np.random.default_rng(1000 + n)
    msgs = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            for _ in range(3)]
    words = _words_of(msgs, n)

    cases = {
        "sha2_512": (lambda w: sha2.sha512_words(w, n),
                     lambda m: hashlib.sha512(m).digest()),
        "keccak512": (lambda w: keccak.sponge_words(w, n, 72, 0x01, 64),
                      keccak.keccak512),
        "sha3_512": (lambda w: keccak.sponge_words(w, n, 72, 0x06, 64),
                     lambda m: hashlib.sha3_512(m).digest()),
    }
    for name, (dev_fn, host_fn) in cases.items():
        got = np.asarray(dev_fn(words)).astype("<u4")
        for b, m in enumerate(msgs):
            assert np.ascontiguousarray(got[:, b]).tobytes() == host_fn(m), \
                f"{name} mismatch at n={n}"


def test_sponge_words_tolerates_extra_trailing_words():
    """sponge_words sizes its padding from msg_bytes, not the caller's
    array: extra zero words beyond the message must not change the digest."""
    import jax.numpy as jnp

    n = 45
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    words = _words_of([msg], n)
    padded = jnp.concatenate([words, jnp.zeros((5, 1), jnp.uint32)], axis=0)
    a = np.asarray(keccak.sponge_words(words, n, 136, 0x01, 32))
    b = np.asarray(keccak.sponge_words(padded, n, 136, 0x01, 32))
    assert a.tobytes() == b.tobytes()
    assert np.ascontiguousarray(a.astype("<u4").T).tobytes() == \
        keccak.keccak256(msg)
