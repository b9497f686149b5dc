"""SHA-3 / Keccak wrappers (parity: ``crypto/src/hash/sha3/mod.rs`` — the
reference wraps the RustCrypto ``sha3`` crate; here stdlib hashlib covers
the NIST variants and our own sponge covers legacy Keccak-256), plus the
expand_message XMD helper used by hash-to-field."""

from __future__ import annotations

import hashlib

from .keccak import keccak256  # legacy (pre-NIST padding) Keccak-256


def sha3_256(data: bytes) -> bytes:
    return hashlib.sha3_256(data).digest()


def sha3_512(data: bytes) -> bytes:
    return hashlib.sha3_512(data).digest()


def sha2_256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int,
                       hash_fn=sha3_256, block_size: int = 136) -> bytes:
    """expand_message_xmd (RFC 9380 §5.3.1), used by the reference's
    ``Sha3Hasher::expand_message``."""
    b_in_bytes = len(hash_fn(b""))
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255:
        raise ValueError("expand_message_xmd: requested length too large")
    dst_prime = dst + len(dst).to_bytes(1, "big")
    z_pad = b"\x00" * block_size
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = hash_fn(z_pad + msg + l_i_b_str + b"\x00" + dst_prime)
    b1 = hash_fn(b0 + b"\x01" + dst_prime)
    blocks = [b1]
    for i in range(2, ell + 1):
        prev = bytes(x ^ y for x, y in zip(b0, blocks[-1]))
        blocks.append(hash_fn(prev + i.to_bytes(1, "big") + dst_prime))
    return b"".join(blocks)[:len_in_bytes]
