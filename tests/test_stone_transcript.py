"""Stone transcript byte-parity (vectors from
``provers/stark/src/transcript.rs`` tests, recorded from the Stone prover).
"""

from lambda_elliptic_curves_tpu.fiat_shamir.stone import StoneProverTranscript


def test_sample_bytes_from_stone_prover_channel():
    t = StoneProverTranscript(bytes([1, 2, 3]))
    t.append_bytes(bytes([4, 5, 6]))
    assert t.sample(32).hex() == (
        "8a3a67d125a5a5ea57c3fbe2c255b60d0c8913a62713e099b377c6c29a218597"
    )
    v = t.sample(64)
    assert v[:4].hex() == "56de562a" and v[-4:].hex() == "c7395232"
    v = t.sample(48)
    assert v[:2].hex() == "e4b6" and v[-2:].hex() == "dfab"
    assert t.sample(32)[-2:].hex() == "5321"
    assert t.sample(16)[-2:].hex() == "73e9"
    assert t.sample(8).hex() == "bd4128dd3abc6618"
    assert t.sample(32)[-4:].hex() == "262f5f7c"
    t.append_bytes(bytes([3, 2]))
    assert t.sample(32)[:4].hex() == "69637201"


def test_sample_field_element_and_u64():
    t = StoneProverTranscript(bytes([1, 2]))
    assert list(t.sample(8)) == [89, 27, 84, 161, 127, 200, 195, 181]
    t = StoneProverTranscript(bytes([1, 2]))
    fe = t.sample_field_element()
    assert hex(fe.value) == (
        "0x20b962ed1a29c942e11dc63c00b51de816bcd8bf9acd221f3fa55e5201d69be"
    )
    t = StoneProverTranscript(bytes([1, 2]))
    assert t.sample_u64(1024) == 949
