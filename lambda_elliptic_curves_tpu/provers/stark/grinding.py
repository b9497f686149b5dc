"""Proof-of-work grinding (parity: ``provers/stark/src/grinding.rs``).

Condition: ``Keccak(Keccak(prefix || seed || factor) || nonce_be8)`` read as
a big-endian u64 over its first 8 bytes must be < 2^(64-factor) — i.e. at
least ``factor`` leading zero bits.  Same 0x0123456789abcded prefix.

The host search loop is fine for the small factors used in tests; the
batched device search (vectorised Keccak over a nonce range — an
embarrassingly parallel TPU win) lives in ``search_nonce_device``.
"""

from __future__ import annotations

import numpy as np

from ...hashes import keccak

PREFIX = bytes([0x01, 0x23, 0x45, 0x67, 0x89, 0xAB, 0xCD, 0xED])


def _inner_hash(seed: bytes, grinding_factor: int) -> bytes:
    return keccak.keccak256(PREFIX + seed + bytes([grinding_factor]))


def is_valid_nonce(seed: bytes, nonce: int, grinding_factor: int) -> bool:
    inner = _inner_hash(seed, grinding_factor)
    digest = keccak.keccak256(inner + nonce.to_bytes(8, "big"))
    return int.from_bytes(digest[:8], "big") < (1 << (64 - grinding_factor))


def generate_nonce(seed: bytes, grinding_factor: int,
                   max_tries: int = 1 << 32) -> int:
    inner = _inner_hash(seed, grinding_factor)
    from ... import native

    found = native.grind(inner, grinding_factor, 0, max_tries)
    if found is not None:
        if found < 0:
            raise RuntimeError("nonce not found")
        return found
    limit = 1 << (64 - grinding_factor)
    for nonce in range(max_tries):
        digest = keccak.keccak256(inner + nonce.to_bytes(8, "big"))
        if int.from_bytes(digest[:8], "big") < limit:
            return nonce
    raise RuntimeError("nonce not found")


def search_nonce_device(seed: bytes, grinding_factor: int,
                        batch: int = 1 << 14, max_rounds: int = 1 << 12) -> int:
    """Vectorised nonce search: hash `batch` candidate nonces per device
    call and take the first hit."""
    import jax.numpy as jnp

    inner = _inner_hash(seed, grinding_factor)
    inner_words = np.array(
        [int.from_bytes(inner[4 * i : 4 * i + 4], "little") for i in range(8)],
        np.uint32,
    )
    limit = 1 << (64 - grinding_factor)
    for r in range(max_rounds):
        base = r * batch
        nonces = np.arange(base, base + batch, dtype=np.uint64)
        # message = inner(32B) || nonce_be8 -> 40 bytes = 10 LE words
        words = np.zeros((10, batch), np.uint32)
        words[:8] = inner_words[:, None]
        be = nonces.astype(">u8").view(np.uint8).reshape(batch, 8)
        words[8] = (
            be[:, 0].astype(np.uint32)
            | (be[:, 1].astype(np.uint32) << 8)
            | (be[:, 2].astype(np.uint32) << 16)
            | (be[:, 3].astype(np.uint32) << 24)
        )
        words[9] = (
            be[:, 4].astype(np.uint32)
            | (be[:, 5].astype(np.uint32) << 8)
            | (be[:, 6].astype(np.uint32) << 16)
            | (be[:, 7].astype(np.uint32) << 24)
        )
        digests = keccak.keccak256_words(jnp.asarray(words), 40)
        from ...ops.limbs import device_to_np
        d = device_to_np(digests)
        # leading 8 bytes big-endian: bytes 0..7 = words 0,1 little-endian
        hi = _bswap32(d[0])
        lo = _bswap32(d[1])
        vals = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        hits = np.nonzero(vals < limit)[0]
        if hits.size:
            return int(base + hits[0])
    raise RuntimeError("nonce not found")


def _bswap32(x):
    x = np.asarray(x, np.uint32)
    return (
        ((x & 0xFF) << 24) | ((x & 0xFF00) << 8)
        | ((x >> 8) & 0xFF00) | (x >> 24)
    )
