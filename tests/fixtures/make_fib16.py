"""Regenerate fib16_proof.bin (the quick-gate verifier fixture).

Run from the repo root: ``python tests/fixtures/make_fib16.py``.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lambda_elliptic_curves_tpu.fields import Stark252  # noqa: E402
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript  # noqa: E402
from lambda_elliptic_curves_tpu.provers.stark import (  # noqa: E402
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (  # noqa: E402
    FibonacciPublicInputs, fibonacci_air_for, fibonacci_trace,
)
from lambda_elliptic_curves_tpu.utils.serialization import (  # noqa: E402
    serialize_proof,
)

f = Stark252
air_cls = fibonacci_air_for(f)
trace = fibonacci_trace(f, [1, 1], 16)
pub = FibonacciPublicInputs(a0=1, a1=1)
opts = ProofOptions(blowup_factor=2, fri_number_of_queries=4,
                    coset_offset=3, grinding_factor=0)
proof = prove(air_cls, trace, pub, opts, DefaultTranscript(f))
assert verify(air_cls, proof, pub, opts, DefaultTranscript(f))
out = pathlib.Path(__file__).parent / "fib16_proof.bin"
out.write_bytes(serialize_proof(proof))
print(f"wrote {out} ({out.stat().st_size} bytes)")
