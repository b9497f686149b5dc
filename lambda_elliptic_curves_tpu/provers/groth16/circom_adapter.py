"""Circom -> Groth16 adapter.

Parity: ``provers/groth16/circom-adapter/src/lib.rs:8`` — parses circom's
``.r1cs.json`` and witness JSON, builds the variable LRO matrices, and
swaps the outputs/inputs blocks (circom orders [1, outputs, inputs,
others]; lambdaworks-style ordering is [1, inputs, outputs, others]).
"""

from __future__ import annotations

import json

from .qap import QuadraticArithmeticProgram


def circom_to_lambda(field, r1cs_json: str, witness_json: str):
    """Returns (QuadraticArithmeticProgram, witness list of ints)."""
    r1cs = json.loads(r1cs_json)
    n_vars = int(r1cs["nVars"])
    n_gates = int(r1cs["nConstraints"])

    l = [[0] * n_gates for _ in range(n_vars)]
    r = [[0] * n_gates for _ in range(n_vars)]
    o = [[0] * n_gates for _ in range(n_vars)]
    for gate, constraint in enumerate(r1cs["constraints"]):
        for mat, part in zip((l, r, o), constraint):
            for var_idx, value in part.items():
                mat[int(var_idx)][gate] = int(value) % field.p

    witness = [int(w) % field.p for w in json.loads(witness_json)]

    # swap outputs <-> inputs blocks
    n_pub = int(r1cs["nPubInputs"])
    n_prv = int(r1cs["nPrvInputs"])
    n_out = int(r1cs["nOutputs"])
    n_in = n_pub + n_prv
    for seq in (l, r, o, witness):
        inputs_block = [seq[n_out + 1 + i] for i in range(n_in)]
        outputs_block = [seq[1 + i] for i in range(n_out)]
        for i in range(n_in):
            seq[1 + i] = inputs_block[i]
        for i in range(n_out):
            seq[1 + n_in + i] = outputs_block[i]

    num_public = n_pub + 1  # "1" counts as public
    qap = from_variable_matrices(field, num_public, l, r, o)
    return qap, witness


def parse_r1cs_bin(data: bytes) -> dict:
    """Parse circom's BINARY ``.r1cs`` format (iden3 r1csfile spec v1 —
    the artifact the circom compiler actually writes, beyond the JSON
    export the reference adapter consumes).

    Layout: magic ``r1cs`` | version u32 | nSections u32 | sections of
    (type u32, size u64, payload).  Section 1 = header (n8 u32, prime n8
    bytes LE, nWires u32, nPubOut u32, nPubIn u32, nPrvIn u32, nLabels
    u64, mConstraints u32); section 2 = constraints, each three linear
    combinations (nEntries u32, then (wireId u32, coeff n8 LE) pairs).

    Returns the same dict shape the ``.r1cs.json`` path consumes, so
    either artifact feeds :func:`circom_to_lambda`.
    """
    from ...utils.errors import DeserializationError

    if data[:4] != b"r1cs":
        raise DeserializationError("not an r1cs file (bad magic)")
    version = int.from_bytes(data[4:8], "little")
    if version != 1:
        raise DeserializationError(f"unsupported r1cs version {version}")
    n_sections = int.from_bytes(data[8:12], "little")
    pos = 12
    sections = {}
    for _ in range(n_sections):
        if pos + 12 > len(data):
            raise DeserializationError("r1cs truncated (section header)")
        stype = int.from_bytes(data[pos: pos + 4], "little")
        size = int.from_bytes(data[pos + 4: pos + 12], "little")
        pos += 12
        if pos + size > len(data):
            raise DeserializationError("r1cs truncated (section body)")
        sections[stype] = data[pos: pos + size]
        pos += size
    if 1 not in sections or 2 not in sections:
        raise DeserializationError("r1cs missing header/constraint section")

    hdr = sections[1]
    n8 = int.from_bytes(hdr[0:4], "little")
    prime = int.from_bytes(hdr[4: 4 + n8], "little")
    off = 4 + n8
    n_wires = int.from_bytes(hdr[off: off + 4], "little")
    n_pub_out = int.from_bytes(hdr[off + 4: off + 8], "little")
    n_pub_in = int.from_bytes(hdr[off + 8: off + 12], "little")
    n_prv_in = int.from_bytes(hdr[off + 12: off + 16], "little")
    m_constraints = int.from_bytes(hdr[off + 24: off + 28], "little")

    body = sections[2]
    pos = 0
    constraints = []
    for _ in range(m_constraints):
        parts = []
        for _lc in range(3):
            n_entries = int.from_bytes(body[pos: pos + 4], "little")
            pos += 4
            lc = {}
            for _e in range(n_entries):
                wire = int.from_bytes(body[pos: pos + 4], "little")
                coeff = int.from_bytes(body[pos + 4: pos + 4 + n8], "little")
                pos += 4 + n8
                lc[str(wire)] = coeff
            parts.append(lc)
        constraints.append(parts)
    if pos != len(body):
        raise DeserializationError("r1cs constraint section length mismatch")

    return {
        "prime": prime,
        "nVars": n_wires,
        "nConstraints": m_constraints,
        "nOutputs": n_pub_out,
        "nPubInputs": n_pub_in,
        "nPrvInputs": n_prv_in,
        "constraints": constraints,
    }


def parse_wtns_bin(data: bytes) -> list:
    """Parse circom/snarkjs BINARY ``.wtns`` witness files: magic
    ``wtns`` | version u32 | nSections u32; section 1 = header (n8 u32,
    prime n8 LE, nWitness u32), section 2 = nWitness values of n8 LE
    bytes.  Returns the witness as a list of ints."""
    from ...utils.errors import DeserializationError

    if data[:4] != b"wtns":
        raise DeserializationError("not a wtns file (bad magic)")
    n_sections = int.from_bytes(data[8:12], "little")
    pos = 12
    sections = {}
    for _ in range(n_sections):
        stype = int.from_bytes(data[pos: pos + 4], "little")
        size = int.from_bytes(data[pos + 4: pos + 12], "little")
        pos += 12
        sections[stype] = data[pos: pos + size]
        pos += size
    if 1 not in sections or 2 not in sections:
        raise DeserializationError("wtns missing header/data section")
    hdr = sections[1]
    n8 = int.from_bytes(hdr[0:4], "little")
    n_wit = int.from_bytes(hdr[4 + n8: 8 + n8], "little")
    body = sections[2]
    if len(body) != n8 * n_wit:
        raise DeserializationError("wtns data section length mismatch")
    return [int.from_bytes(body[i * n8:(i + 1) * n8], "little")
            for i in range(n_wit)]


def circom_bin_to_lambda(field, r1cs_bytes: bytes, wtns_bytes: bytes):
    """Binary-artifact entry: ``.r1cs`` + ``.wtns`` files straight from
    the circom/snarkjs toolchain -> (QAP, witness).  Validates that both
    artifacts were produced over ``field``'s modulus."""
    from ...utils.errors import DeserializationError

    r1cs = parse_r1cs_bin(r1cs_bytes)
    if r1cs["prime"] != field.p:
        raise DeserializationError(
            f"r1cs prime {hex(r1cs['prime'])} != field modulus")
    witness = parse_wtns_bin(wtns_bytes)
    import json

    return circom_to_lambda(field, json.dumps(
        {k: v for k, v in r1cs.items() if k != "prime"}),
        json.dumps(witness))


def from_variable_matrices(field, num_public_inputs, l, r, o):
    """Variable-major matrices -> QAP (``qap.rs:from_variable_matrices``)."""
    num_gates = len(l[0])
    padded = 1 << (num_gates - 1).bit_length() if num_gates > 1 else 1

    def to_rows(mat):
        return [[mat[v][g] for v in range(len(mat))]
                for g in range(num_gates)] + \
            [[0] * len(mat) for _ in range(padded - num_gates)]

    return QuadraticArithmeticProgram(
        field=field,
        num_of_public_inputs=num_public_inputs,
        num_of_gates=padded,
        a=to_rows(l), b=to_rows(r), c=to_rows(o),
    )
