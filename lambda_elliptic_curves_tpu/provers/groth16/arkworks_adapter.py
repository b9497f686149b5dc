"""Arkworks R1CS adapter (parity: ``provers/groth16/arkworks-adapter/src/
lib.rs:107``).

The reference converts an in-process arkworks ``ConstraintSystemRef`` into
a lambdaworks R1CS.  A Rust arkworks runtime cannot be linked here, so the
TPU-native equivalent consumes arkworks' *serialized* constraint system —
the ``ConstraintMatrices`` produced by ``cs.to_matrices()`` (sparse rows of
``(coeff, var_index)`` pairs over the variable order
``[one, instance..., witness...]``) plus the assignment vectors — as JSON:

    {
      "num_instance_variables": k,      # INCLUDING the leading one
      "num_witness_variables":  m,
      "a": [[[coeff, index], ...], ...],   # one sparse row per constraint
      "b": ...,  "c": ...,
      "instance_assignment": [1, x1, ...],     # optional
      "witness_assignment":  [w1, ...]         # optional
    }

Coefficients and assignments are decimal strings or ints (arkworks prints
field elements as decimal).  Variable order is preserved: lambdaworks'
Groth16 witness layout is also ``[1, public..., private...]``
(``r1cs.rs:19``), so densification is the whole conversion — exactly the
reference adapter's job minus Rust lifetimes.
"""

from __future__ import annotations

import json


def _as_int(v, p: int) -> int:
    return int(v) % p


def arkworks_to_lambda(field, matrices_json: str):
    """Parse an arkworks constraint-matrices JSON export.

    Returns ``(R1CS, witness_or_None)`` — witness is the full
    ``[1, instance..., witness...]`` vector when the export carries the
    assignments."""
    from .r1cs import R1CS

    data = json.loads(matrices_json)
    p = field.p
    n_inst = int(data["num_instance_variables"])
    n_wit = int(data["num_witness_variables"])
    n_vars = n_inst + n_wit

    # arkworks' ConstraintMatrices carries redundant counts
    # (num_constraints, {a,b,c}_num_non_zero) — validate them when the
    # export includes them, so a mangled artifact fails loudly
    if "num_constraints" in data:
        for m in ("a", "b", "c"):
            if len(data[m]) != int(data["num_constraints"]):
                raise ValueError(f"matrix {m!r} row count != num_constraints")
    for m in ("a", "b", "c"):
        key = f"{m}_num_non_zero"
        if key in data:
            nnz = sum(len(row) for row in data[m])
            if nnz != int(data[key]):
                raise ValueError(f"{key} mismatch: {nnz}")

    def dense(sparse_rows):
        rows = []
        for row in sparse_rows:
            dense_row = [0] * n_vars
            for coeff, idx in row:
                idx = int(idx)
                if not 0 <= idx < n_vars:
                    raise ValueError(f"variable index {idx} out of range")
                dense_row[idx] = (dense_row[idx] + _as_int(coeff, p)) % p
            rows.append(dense_row)
        return rows

    r1cs = R1CS.from_matrices(dense(data["a"]), dense(data["b"]),
                              dense(data["c"]), number_of_inputs=n_inst)

    witness = None
    if "instance_assignment" in data and "witness_assignment" in data:
        inst = [_as_int(v, p) for v in data["instance_assignment"]]
        wit = [_as_int(v, p) for v in data["witness_assignment"]]
        if len(inst) != n_inst or len(wit) != n_wit:
            raise ValueError("assignment lengths do not match variable "
                             "counts")
        if inst and inst[0] != 1:
            raise ValueError("instance assignment must start with 1")
        witness = inst + wit
    return r1cs, witness
