"""Merkle tree CLI (parity: ``examples/merkle-tree-cli/src/main.rs``):
build a Poseidon Merkle tree from a CSV of values, emit the root, generate
and verify inclusion proofs.

Usage:
    python -m lambda_elliptic_curves_tpu.examples.merkle_tree_cli \
        generate-tree values.csv
    ... generate-proof values.csv <pos> proof.json
    ... verify-proof <root_hex> <pos> <value_hex> proof.json
"""

from __future__ import annotations

import json
import sys


def _read_values(path):
    with open(path) as f:
        return [int(tok.strip(), 16 if tok.strip().lower().startswith("0x")
                    else 10)
                for tok in f.read().replace("\n", ";").split(";")
                for tok in tok.split(",") if tok.strip()]


def _build(path):
    from ..fields import Stark252
    from ..merkle import MerkleTree, PoseidonBackend

    values = _read_values(path)
    backend = PoseidonBackend()
    tree = MerkleTree.build(backend, Stark252.array(values))
    return tree, backend, values


def main(argv=None):
    argv = argv or sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd = argv[0]
    if cmd == "generate-tree":
        tree, _, _ = _build(argv[1])
        print(f"root: {tree.root:#x}")
    elif cmd == "generate-proof":
        tree, _, values = _build(argv[1])
        pos = int(argv[2])
        proof = tree.get_proof_by_pos(pos)
        blob = {
            "root": hex(tree.root),
            "pos": pos,
            "value": hex(values[pos]),
            "merkle_path": [hex(v) for v in proof.merkle_path],
        }
        with open(argv[3], "w") as f:
            json.dump(blob, f, indent=2)
        print(f"proof for position {pos} written to {argv[3]}")
    elif cmd == "verify-proof":
        from ..merkle import PoseidonBackend, Proof

        root, pos, value, path = (
            int(argv[1], 16), int(argv[2]), int(argv[3], 16), argv[4]
        )
        with open(path) as f:
            blob = json.load(f)
        proof = Proof(merkle_path=[int(v, 16) for v in blob["merkle_path"]])
        ok = proof.verify(PoseidonBackend(), root, pos, value)
        print("verified" if ok else "INVALID PROOF")
        return 0 if ok else 2
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
