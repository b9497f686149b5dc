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
