"""End-to-end circom -> Groth16 tutorial (parity:
``examples/prove-verify-circom/src/main.rs``).

The reference's tutorial reads the ``.r1cs.json`` + witness JSON that
``circom --json`` / ``snarkjs wtns export json`` emit, converts them to a
QAP through the circom adapter, and runs the full Groth16 pipeline.  Same
flow here over the TPU-native Groth16 (device MSMs for the proof, host
pairings for the check):

    python -m lambda_elliptic_curves_tpu.examples.prove_verify_circom \
        [circuit.r1cs.json witness.json]

Without arguments it proves the repo's ``circom_mul`` fixture
(``a * b = out`` with ``a`` private).
"""

from __future__ import annotations


def prove_and_verify(r1cs_json: str, witness_json: str, seed: int = 0):
    """circom JSON artifacts -> (proof, verifying key, public inputs,
    accepted).  The witness comes back in lambdaworks variable order
    ``[1, public..., private...]`` (``circom-adapter/src/lib.rs:8``)."""
    import random

    from ..fields.zoo import BLS12381Fr
    from ..provers.groth16 import prove, setup, verify
    from ..provers.groth16.circom_adapter import circom_to_lambda

    qap, witness = circom_to_lambda(BLS12381Fr, r1cs_json, witness_json)
    pk, vk = setup(qap, rng=random.Random(seed or None))
    proof = prove(witness, qap, pk, rng=random.Random(seed + 1 or None))
    pub = witness[:qap.num_of_public_inputs]
    return proof, vk, pub, verify(vk, proof, pub)


def main(argv=None):
    import pathlib
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv:
        r1cs_path, wtns_path = map(pathlib.Path, argv[:2])
    else:
        fixtures = (pathlib.Path(__file__).resolve().parents[2] / "tests" /
                    "fixtures")
        r1cs_path = fixtures / "circom_mul.r1cs.json"
        wtns_path = fixtures / "circom_mul.witness.json"

    print(f"Reading {r1cs_path} and {wtns_path}")
    proof, vk, pub, ok = prove_and_verify(r1cs_path.read_text(),
                                          wtns_path.read_text())
    print(f"Public inputs: {pub}")
    print("Proof verified!" if ok else "PROOF REJECTED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
