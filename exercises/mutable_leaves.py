"""Exercise 4 — leaves that aren't.

A Merkle commitment whose verifier hashes leaves and inner nodes with
the SAME function and no domain separation: ``leaf = keccak(data)``,
``node = keccak(left || right)`` where ``data`` may be any byte string.
An attacker can present the concatenation of two inner digests as a
"leaf", proving membership of data that was never committed.

(The framework's ``KeccakFieldBackend`` does not share the flaw: its
leaves are fixed-width field-element bytes, so a 64-byte node image can
never collide with a leaf image.)
"""

from __future__ import annotations

from lambda_elliptic_curves_tpu.hashes.keccak import keccak256


def build(leaves: list) -> list:
    """levels[0] = leaf digests ... levels[-1] = [root]."""
    level = [keccak256(leaf) for leaf in leaves]
    levels = [level]
    while len(level) > 1:
        level = [keccak256(level[i] + level[i + 1])
                 for i in range(0, len(level), 2)]
        levels.append(level)
    return levels


def root(levels) -> bytes:
    return levels[-1][0]


def prove(levels, index: int) -> list:
    path = []
    for level in levels[:-1]:
        path.append(level[index ^ 1])
        index //= 2
    return path


def verify(root_: bytes, index: int, data: bytes, path: list) -> bool:
    # BUG: arbitrary-length ``data`` is hashed exactly like an inner node.
    node = keccak256(data)
    for sibling in path:
        node = keccak256(node + sibling) if index % 2 == 0 else \
            keccak256(sibling + node)
        index //= 2
    return node == root_
