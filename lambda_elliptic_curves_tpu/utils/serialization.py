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
            return bytes.fromhex(obj["__bytes__"])
        if "__int__" in obj:
            return int(obj["__int__"], 16)
        if "__merkle_proof__" in obj:
            return MerkleProof(merkle_path=_decode(obj["__merkle_proof__"]))
        if "__type__" in obj:
            cls = getattr(stark_proof, obj["__type__"])
            return cls(**{k: _decode(v) for k, v in obj["fields"].items()})
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def serialize_proof(proof) -> bytes:
    """StarkProof -> bytes (deterministic)."""
    return json.dumps(_encode(proof), sort_keys=True).encode()


def deserialize_proof(data: bytes):
    """bytes -> StarkProof; raises DeserializationError on malformed input."""
    from .errors import DeserializationError

    try:
        return _decode(json.loads(data.decode()))
    except (ValueError, KeyError, TypeError) as exc:
        raise DeserializationError(str(exc)) from exc
