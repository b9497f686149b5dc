"""Hash-family differential fuzzing: every sponge/digest implementation
vs an independent oracle (hashlib where one exists, the host sponge
elsewhere) across message lengths that cross block boundaries — parity
with the reference's reliance on the audited RustCrypto ``sha3``/``sha2``
crates (our implementations are from-scratch and need the coverage the
reference gets for free)."""

import hashlib

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.hashes import keccak, sha2, sha3

# lengths crossing rate boundaries for keccak-256 (rate 136), keccak-512
# (rate 72), sha2-256 (block 64) and sha2-512 (block 128)
_LENGTHS = (0, 1, 55, 56, 63, 64, 71, 72, 73, 135, 136, 137, 200)


def _msgs():
    rng = np.random.default_rng(0)
    return [rng.bytes(n) for n in _LENGTHS]


def test_sha3_256_host_vs_hashlib():
    for msg in _msgs():
        assert sha3.sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_sha3_512_host_vs_hashlib():
    for msg in _msgs():
        assert sha3.sha3_512(msg) == hashlib.sha3_512(msg).digest()


def test_keccak256_known_answers():
    # the Ethereum KATs (keccak, NOT sha3: pad byte 0x01)
    assert keccak.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")


def test_keccak512_known_answer():
    assert keccak.keccak512(b"").hex() == (
        "0eab42de4c3ceb9235fc91acffe746b29c29a8c366b7c60e4e67c466f36a4304"
        "c00fa9caf9d87976ba469bcbe06713b435f091ef2769fb160cdab33d3670680e")


def test_python_sponge_vs_native_c():
    """The pure-Python sponge and the native C keccak must agree (the C
    path serves transcripts; the Python path is the oracle)."""
    from lambda_elliptic_curves_tpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")
    for msg in _msgs():
        assert native.keccak256(msg) == keccak._keccak256_py(msg)


def test_device_sha512_words_vs_hashlib():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    msg_len = 100
    msgs = [rng.bytes(msg_len) for _ in range(3)]
    words = jnp.asarray(_word_batch(msgs, msg_len))
    out = sha2.sha512_words(words, msg_len)
    got = np.ascontiguousarray(
        np.asarray(out).astype("<u4").reshape(16, -1).T).tobytes()
    for b, m in enumerate(msgs):
        assert got[64 * b: 64 * (b + 1)] == hashlib.sha512(m).digest()


def _word_batch(msgs, word_len):
    """Pack equal-length messages into the (W, B) uint32 LE word layout."""
    B = len(msgs)
    W = max(1, (word_len + 3) // 4)
    arr = np.zeros((W, B), dtype=np.uint32)
    for b, m in enumerate(msgs):
        padded = m + b"\x00" * (4 * W - len(m))
        arr[:, b] = np.frombuffer(padded, dtype="<u4")
    return arr


@pytest.mark.parametrize("nbytes", [32, 64, 100])
def test_device_keccak256_vs_host(nbytes):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    msgs = [rng.bytes(nbytes) for _ in range(4)]
    words = jnp.asarray(_word_batch(msgs, nbytes))
    digests = keccak.digest_words_to_bytes(
        keccak.keccak256_words(words, nbytes))
    assert digests == [keccak.keccak256(m) for m in msgs]


@pytest.mark.parametrize("algo,rate,pad,nbytes,oracle", [
    ("sha3_256", 136, 0x06, 32, lambda m: hashlib.sha3_256(m).digest()),
    ("sha3_512", 72, 0x06, 64, lambda m: hashlib.sha3_512(m).digest()),
    ("keccak512", 72, 0x01, 64, keccak.keccak512),
])
def test_device_sponge_variants_vs_oracle(algo, rate, pad, nbytes, oracle):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    msg_len = 48
    msgs = [rng.bytes(msg_len) for _ in range(3)]
    words = jnp.asarray(_word_batch(msgs, msg_len))
    out = keccak.sponge_words(words, msg_len, rate, pad, nbytes)
    got = np.ascontiguousarray(
        np.asarray(out).astype("<u4").reshape(nbytes // 4, -1).T).tobytes()
    for b, m in enumerate(msgs):
        assert got[nbytes * b: nbytes * (b + 1)] == oracle(m)


def test_device_sha256_words_vs_hashlib():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    msg_len = 64
    msgs = [rng.bytes(msg_len) for _ in range(3)]
    words = jnp.asarray(_word_batch(msgs, msg_len))
    out = sha2.sha256_words(words, msg_len)
    got = np.ascontiguousarray(
        np.asarray(out).astype("<u4").reshape(8, -1).T).tobytes()
    for b, m in enumerate(msgs):
        assert got[32 * b: 32 * (b + 1)] == hashlib.sha256(m).digest()


def test_poseidon_device_vs_host_batch():
    from lambda_elliptic_curves_tpu.fields import Stark252
    from lambda_elliptic_curves_tpu.hashes import poseidon

    rng = np.random.default_rng(4)
    xs = [int(v) for v in rng.integers(1, 1 << 48, 4)]
    ys = [int(v) for v in rng.integers(1, 1 << 48, 4)]
    left = Stark252.array(xs)
    right = Stark252.array(ys)
    got = Stark252.to_ints(poseidon.hash_pairs(left, right))
    for i in range(4):
        want = poseidon.hash_host(Stark252(xs[i]), Stark252(ys[i])).value
        assert int(got[i]) == want


def test_monolith_permutation_invertible_structure():
    from lambda_elliptic_curves_tpu.hashes import MonolithMersenne31

    m = MonolithMersenne31(16, 5)
    s1 = m.permutation(list(range(16)))
    s2 = m.permutation(list(range(16)))
    assert s1 == s2  # deterministic
    assert s1 != list(range(16))
    # bars/bricks/concrete stay in-field
    assert all(0 <= v < (1 << 31) - 1 for v in s1)


def test_hash_to_field_expand_properties():
    from lambda_elliptic_curves_tpu.fields import BLS12381Fr
    from lambda_elliptic_curves_tpu.hashes.hash_to_field import hash_to_field

    nb = BLS12381Fr.params.num_bytes
    l = nb + nb // 2
    seed = bytes(range(256))[: 4 * l]
    out1 = hash_to_field(BLS12381Fr, seed, 4)
    out2 = hash_to_field(BLS12381Fr, seed, 4)
    out3 = hash_to_field(BLS12381Fr, bytes(4 * l), 4)
    assert out1 == out2 and out1 != out3
    assert len(out1) == 4
    assert all(0 <= v.value < BLS12381Fr.p for v in out1)
    # each chunk reduces mod p exactly
    want0 = int.from_bytes(seed[:l], "big") % BLS12381Fr.p
    assert out1[0].value == want0
