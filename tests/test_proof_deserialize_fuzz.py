"""Proof-deserializer robustness: malformed bytes must raise clean
``DeserializationError``s (or decode to something ``verify`` rejects) —
never crash, never verify.

Parity: the reference fuzzes its proof parser
(``fuzz/no_gpu_fuzz/fuzz_targets/deserialize_stark_proof.rs:1``); these are
the hypothesis-property equivalents over the framework's wire format.
"""

import json
import pathlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lambda_elliptic_curves_tpu.utils.errors import DeserializationError
from lambda_elliptic_curves_tpu.utils.serialization import (
    deserialize_proof, serialize_proof,
)

FIXTURE = (pathlib.Path(__file__).parent / "fixtures" /
           "fib16_proof.bin").read_bytes()

_SETTINGS = settings(max_examples=60, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


def _decodes_cleanly(data: bytes):
    """The single robustness contract: DeserializationError or a proof."""
    try:
        return deserialize_proof(data)
    except DeserializationError:
        return None


def test_roundtrip_is_stable():
    proof = deserialize_proof(FIXTURE)
    assert serialize_proof(proof) == FIXTURE


@_SETTINGS
@given(st.integers(min_value=0, max_value=len(FIXTURE) - 1))
def test_truncation_never_crashes(cut):
    _decodes_cleanly(FIXTURE[:cut])


@_SETTINGS
@given(st.integers(min_value=0, max_value=len(FIXTURE) - 1),
       st.integers(min_value=1, max_value=255))
def test_byte_corruption_never_crashes(pos, xor):
    data = bytearray(FIXTURE)
    data[pos] ^= xor
    _decodes_cleanly(bytes(data))


@_SETTINGS
@given(st.binary(min_size=0, max_size=4096))
def test_random_bytes_never_crash(data):
    _decodes_cleanly(data)


@_SETTINGS
@given(st.text(alphabet="{}[]\",:abcdef0123456789_", max_size=256))
def test_json_shaped_garbage_never_crashes(text):
    _decodes_cleanly(text.encode())


def test_type_confusion_is_rejected():
    """The __type__ tag must be allowlisted — module attributes are not
    constructible from the wire."""
    for name in ("Verifier", "__builtins__", "os", "eval", "list"):
        payload = json.dumps(
            {"__type__": name, "fields": {}}).encode()
        with pytest.raises(DeserializationError):
            deserialize_proof(payload)


def test_malformed_tagged_leaves_are_rejected():
    cases = [
        {"__bytes__": 123},                      # non-string payload
        {"__bytes__": "zz"},                     # non-hex
        {"__int__": ["0x1"]},                    # non-string payload
        {"__merkle_proof__": [1, 2, 3]},         # non-bytes path nodes
        {"__type__": "StarkProof"},              # missing fields
        {"__type__": "StarkProof", "fields": []},  # wrong fields type
        {"unknown_tag": 1},                      # unknown tagged object
        1.5,                                     # float leaf
        "bare string leaf",
    ]
    for case in cases:
        with pytest.raises(DeserializationError):
            deserialize_proof(json.dumps(case).encode())


def test_deep_nesting_is_rejected_cleanly():
    data = b"[" * 100000 + b"]" * 100000
    with pytest.raises(DeserializationError):
        deserialize_proof(data)


@pytest.mark.quick
def test_corrupted_proofs_never_verify():
    """Decodable-but-corrupted proofs must reject (False), not crash:
    field-level mutations of a valid proof through the public verify()."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lambda_elliptic_curves_tpu.fields import Stark252
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
    from lambda_elliptic_curves_tpu.provers.stark import (
        ProofOptions, verify,
    )
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
        FibonacciPublicInputs, fibonacci_air_for,
    )

    f = Stark252
    air_cls = fibonacci_air_for(f)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    opts = ProofOptions(blowup_factor=2, fri_number_of_queries=4,
                        coset_offset=3, grinding_factor=0)

    def fresh():
        return deserialize_proof(FIXTURE)

    # sanity: the untampered fixture verifies
    assert verify(air_cls, fresh(), pub, opts, DefaultTranscript(f))

    mutations = []

    def mut(fn):
        mutations.append(fn)
        return fn

    @mut
    def flip_root(p):
        p.lde_trace_main_merkle_root = bytes(
            b ^ 1 for b in p.lde_trace_main_merkle_root)

    @mut
    def drop_ood(p):
        p.trace_ood_evaluations = p.trace_ood_evaluations[:1]

    @mut
    def empty_queries(p):
        p.query_list = []

    @mut
    def scramble_trace_length(p):
        p.trace_length = 3  # not a power of two

    @mut
    def negative_values(p):
        p.composition_poly_parts_ood_evaluation = [
            -v - 1 for v in p.composition_poly_parts_ood_evaluation]

    @mut
    def wrong_leaf_types(p):
        p.deep_poly_openings = "not a list"

    for mutate in mutations:
        p = fresh()
        mutate(p)
        assert verify(air_cls, p, pub, opts, DefaultTranscript(f)) is False, \
            f"mutation {mutate.__name__} must reject"
