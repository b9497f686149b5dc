"""Serialization helpers (parity: ``math/src/traits.rs`` ByteConversion /
AsBytes / Deserializable and the proof serde surface).

Proof objects serialize to a deterministic JSON-with-hex encoding (the
reference uses serde/CBOR; the on-wire format here is framework-defined,
with the Stone-compatible byte serializer as a separate target).
"""

from __future__ import annotations

import json


def _encode(obj):
    from ..merkle.tree import Proof as MerkleProof
    from ..provers.stark.proof import (
        DeepPolynomialOpening, FriDecommitment, PolynomialOpenings, StarkProof,
    )

    if isinstance(obj, bytes):
        return {"__bytes__": obj.hex()}
    if isinstance(obj, int):
        return obj if abs(obj) < (1 << 53) else {"__int__": hex(obj)}
    if isinstance(obj, list):
        return [_encode(v) for v in obj]
    if isinstance(obj, MerkleProof):
        return {"__merkle_proof__": _encode(obj.merkle_path)}
    if isinstance(obj, (StarkProof, PolynomialOpenings, DeepPolynomialOpening,
                        FriDecommitment)):
        return {
            "__type__": type(obj).__name__,
            "fields": {k: _encode(v) for k, v in vars(obj).items()},
        }
    if obj is None:
        return None
    raise TypeError(f"cannot serialize {type(obj)}")


def _decode(obj):
    from ..merkle.tree import Proof as MerkleProof
    from ..provers.stark import proof as stark_proof

    if isinstance(obj, dict):
        if "__bytes__" in obj:
            if not isinstance(obj["__bytes__"], str):
                raise ValueError("__bytes__ payload must be a hex string")
            return bytes.fromhex(obj["__bytes__"])
        if "__int__" in obj:
            if not isinstance(obj["__int__"], str):
                raise ValueError("__int__ payload must be a hex string")
            return int(obj["__int__"], 16)
        if "__merkle_proof__" in obj:
            path = _decode(obj["__merkle_proof__"])
            if not isinstance(path, list) or \
                    not all(isinstance(x, bytes) for x in path):
                raise ValueError("merkle path must be a list of byte nodes")
            return MerkleProof(merkle_path=path)
        if "__type__" in obj:
            # allowlist: only the proof dataclasses are constructible from
            # the wire — never arbitrary module attributes
            name = obj["__type__"]
            allowed = ("StarkProof", "PolynomialOpenings",
                       "DeepPolynomialOpening", "FriDecommitment")
            if name not in allowed:
                raise ValueError(f"unknown proof type {name!r}")
            cls = getattr(stark_proof, name)
            fields = obj.get("fields")
            if not isinstance(fields, dict):
                raise ValueError("proof fields must be an object")
            return cls(**{k: _decode(v) for k, v in fields.items()})
        raise ValueError("unknown tagged object in proof stream")
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    if obj is None or isinstance(obj, int):
        return obj
    raise ValueError(f"unexpected leaf of type {type(obj).__name__}")


def serialize_proof(proof) -> bytes:
    """StarkProof -> bytes (deterministic)."""
    return json.dumps(_encode(proof), sort_keys=True).encode()


def deserialize_proof(data: bytes):
    """bytes -> StarkProof; raises DeserializationError on malformed input."""
    from .errors import DeserializationError

    try:
        return _decode(json.loads(data.decode()))
    except (ValueError, KeyError, TypeError, RecursionError,
            UnicodeDecodeError) as exc:
        raise DeserializationError(str(exc)[:500]) from exc
