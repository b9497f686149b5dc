"""DefaultTranscript byte-parity with the reference.

KATs from ``crypto/src/fiat_shamir/default_transcript.rs`` tests
(``basic_challenge``).
"""

from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.fields import BLS12381Fr, Stark252


def test_basic_challenge_vectors():
    t = DefaultTranscript(BLS12381Fr)
    t.append_bytes(bytes([0xFF, 0xAB]))
    t.append_bytes(bytes([0xDD, 0x8C, 0x9D]))
    c1 = t.sample()
    assert c1.hex() == (
        "0c2bd8cf2d71e00acea3bd5dc79f4f93ed5742d023bd47c904c2679dbcfa7ca7"
    )
    t.append_bytes(bytes([0xFF, 0xAB]))
    t.append_bytes(bytes([0xDD, 0x8C, 0x9D]))
    c2 = t.sample()
    assert c2.hex() == (
        "816151c57ecb45d5171a3c2e38045dfb3a3d338a22aff86085b9543ff83232bc"
    )


def test_sample_field_element_and_u64():
    t = DefaultTranscript(Stark252)
    t.append_field_element(Stark252(42))
    fe = t.sample_field_element()
    assert 0 <= fe.value < Stark252.p
    n = t.sample_u64(8)
    assert 0 <= n < 8
    # deterministic
    t2 = DefaultTranscript(Stark252)
    t2.append_field_element(Stark252(42))
    assert t2.sample_field_element() == fe


def test_sample_z_ood_not_in_domains():
    t = DefaultTranscript(Stark252)
    t.append_bytes(b"seed")
    z = t.sample_z_ood(lde_coset_offset=3, lde_size=16, trace_root_order=2)
    f = Stark252
    assert (z**16) != f(3) ** 16
    assert (z**4) != f(1)
