"""Example applications + Edwards/Montgomery models + misc parity tests."""

import random

import pytest

from lambda_elliptic_curves_tpu.curves.edwards import (
    BandersnatchCurve, Ed448Goldilocks, TinyJubJubEdwards,
)
from lambda_elliptic_curves_tpu.curves.montgomery import TinyJubJubMontgomery
from lambda_elliptic_curves_tpu.examples.shamir_secret_sharing import (
    ShamirSecretSharing,
)
from lambda_elliptic_curves_tpu.fields import Stark252, U64TestField
from lambda_elliptic_curves_tpu.utils.unsigned_integer import U256, UnsignedInteger


def test_edwards_group_laws():
    for curve in (TinyJubJubEdwards, BandersnatchCurve, Ed448Goldilocks):
        g = curve.generator()
        assert curve.defining_equation(g.x, g.y) == 0
        assert g + curve.neutral() == g
        assert (g + (-g)).is_neutral_element()
        assert g.double() == g + g
        assert g * 5 == g + g + g + g + g


def test_bandersnatch_scalar_mul_kat():
    # bandersnatch/curve.rs:64-82: 5*g and (r+5)*g share the x-coordinate
    g = BandersnatchCurve.generator()
    x5 = (g * 5).x
    assert x5 == int(
        "68CBECE0B8FB55450410CBC058928A567EED293D168FAEF44BFDE25F943AABE0", 16
    )
    scalar = int(
        "1CFB69D4CA675F520CCE760202687600FF8F87007419047174FD06B52876E7E6", 16
    )
    assert (g * scalar).x == x5


def test_montgomery_group_law():
    g = TinyJubJubMontgomery.generator()
    assert TinyJubJubMontgomery.defining_equation(g.x, g.y) == 0
    assert (g + (-g)).is_neutral_element()
    assert g.double() == g + g
    assert g * 7 == sum([g] * 6, g)


def test_shamir():
    f = Stark252
    secret = 0xDEADBEEF
    sss = ShamirSecretSharing(f, secret, k=3)
    shares = sss.generate_shares(5)
    recovered = ShamirSecretSharing.recover(f, shares[:3])
    assert recovered.value == secret
    recovered2 = ShamirSecretSharing.recover(f, shares[2:5])
    assert recovered2.value == secret


def test_merkle_cli(tmp_path):
    from lambda_elliptic_curves_tpu.examples.merkle_tree_cli import main

    csv = tmp_path / "values.csv"
    csv.write_text("1,2,3;4,5")
    assert main(["generate-tree", str(csv)]) == 0
    proof_path = tmp_path / "proof.json"
    assert main(["generate-proof", str(csv), "2", str(proof_path)]) == 0
    import json

    blob = json.loads(proof_path.read_text())
    assert main(["verify-proof", blob["root"], "2", blob["value"],
                 str(proof_path)]) == 0
    assert main(["verify-proof", blob["root"], "2", "0x999",
                 str(proof_path)]) == 2


def test_unsigned_integer():
    a = U256(2**200 + 5)
    b = U256(2**200)
    assert int(a - b) == 5
    assert int(a + b) == 2**201 + 5
    wrap = UnsignedInteger(64, 2**64 - 1) + 1
    assert int(wrap) == 0
    assert UnsignedInteger.from_hex(256, "ff").value == 255
    q, r = U256(100).div_rem(7)
    assert (int(q), int(r)) == (14, 2)
    assert a.to_bytes_be()[-1] == 5
    assert len(a.limbs64()) == 4
    with pytest.raises(Exception):
        UnsignedInteger.from_hex(256, "zz")


def test_proof_serialization_roundtrip():
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
    from lambda_elliptic_curves_tpu.provers.stark import ProofOptions, prove, verify
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
        FibonacciPublicInputs, fibonacci_air_for, fibonacci_trace,
    )
    from lambda_elliptic_curves_tpu.utils.serialization import (
        deserialize_proof, serialize_proof,
    )

    field = U64TestField
    air_cls = fibonacci_air_for(field)
    trace = fibonacci_trace(field, [1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript

    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    blob = serialize_proof(proof)
    restored = deserialize_proof(blob)
    assert verify(air_cls, restored, pub, options, DefaultTranscript(field))
