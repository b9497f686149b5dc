"""Bytes -> field elements (parity: ``crypto/src/hash/hash_to_field.rs:13``,
the hash-to-curve draft's hash_to_field over pseudo-random bytes)."""

from __future__ import annotations

from ..fields.field import PrimeField


def hash_to_field(field: PrimeField, pseudo_random_bytes: bytes,
                  count: int) -> list:
    """Split the byte string into ``count`` chunks of L bytes and reduce
    each mod p (L = bytes(p) * 1.5, the reference's security-margin
    length)."""
    nb = field.params.num_bytes
    l = nb + nb // 2
    out = []
    for i in range(count):
        chunk = pseudo_random_bytes[l * i: l * (i + 1)]
        out.append(field(int.from_bytes(chunk, "big")))
    return out
