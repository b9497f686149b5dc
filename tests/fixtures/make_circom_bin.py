"""Generate binary circom artifacts (``circom_mul.r1cs`` + lambda
``circom_mul.wtns``) from the JSON fixtures, byte-laid-out per the iden3
r1csfile/wtnsfile specs v1 — the same format ``circom --r1cs`` and
``snarkjs wtns calculate`` emit (circom's ``--prime bls12381`` mode for
this fixture's modulus).  Provenance: constructed by this script from
``circom_mul.r1cs.json`` / ``circom_mul.witness.json`` (which mirror
snarkjs ``r1cs export json`` output for the 2-gate mul circuit); any
real circom-produced file of the same circuit parses identically.

Run from the repo root:  python tests/fixtures/make_circom_bin.py
"""

import json
import pathlib

HERE = pathlib.Path(__file__).parent

BLS12381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
N8 = 32


def _section(stype: int, payload: bytes) -> bytes:
    return (stype.to_bytes(4, "little") + len(payload).to_bytes(8, "little")
            + payload)


def make_r1cs() -> bytes:
    r1cs = json.loads((HERE / "circom_mul.r1cs.json").read_text())
    n_wires = int(r1cs["nVars"])
    header = (
        N8.to_bytes(4, "little")
        + BLS12381_FR.to_bytes(N8, "little")
        + n_wires.to_bytes(4, "little")
        + int(r1cs["nOutputs"]).to_bytes(4, "little")
        + int(r1cs["nPubInputs"]).to_bytes(4, "little")
        + int(r1cs["nPrvInputs"]).to_bytes(4, "little")
        + n_wires.to_bytes(8, "little")             # nLabels
        + int(r1cs["nConstraints"]).to_bytes(4, "little")
    )
    body = bytearray()
    for constraint in r1cs["constraints"]:
        for lc in constraint:
            body += len(lc).to_bytes(4, "little")
            for wire, coeff in lc.items():
                body += int(wire).to_bytes(4, "little")
                body += (int(coeff) % BLS12381_FR).to_bytes(N8, "little")
    # wire-to-label map (section 3): identity, as circom emits for
    # un-optimized circuits
    labels = b"".join(i.to_bytes(8, "little") for i in range(n_wires))
    return (b"r1cs" + (1).to_bytes(4, "little") + (3).to_bytes(4, "little")
            + _section(1, header) + _section(2, bytes(body))
            + _section(3, labels))


def make_wtns() -> bytes:
    witness = json.loads((HERE / "circom_mul.witness.json").read_text())
    header = (N8.to_bytes(4, "little")
              + BLS12381_FR.to_bytes(N8, "little")
              + len(witness).to_bytes(4, "little"))
    body = b"".join(
        (int(w) % BLS12381_FR).to_bytes(N8, "little") for w in witness)
    return (b"wtns" + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
            + _section(1, header) + _section(2, body))


if __name__ == "__main__":
    (HERE / "circom_mul.r1cs").write_bytes(make_r1cs())
    (HERE / "circom_mul.wtns").write_bytes(make_wtns())
    print("wrote circom_mul.r1cs + circom_mul.wtns")
