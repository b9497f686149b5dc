"""Point serialization + compression (parity: ``short_weierstrass/
point.rs:239,281``, ``bls12_381/compression.rs``, ``bn_254/compression.rs``).

The BLS12-381 compressed-generator vector is the standard Zcash encoding
(also produced by the reference's compress_g1_point), so it doubles as a
cross-implementation KAT.
"""

import pytest

from lambda_elliptic_curves_tpu.curves.pairings import (
    AffinePoint, BLS12381Pairing, BN254Pairing,
)
from lambda_elliptic_curves_tpu.curves.serialization import (
    compress_g1, compress_g2, decompress_g1, decompress_g2,
    deserialize_point, serialize_point, sqrt_fp2,
)
from lambda_elliptic_curves_tpu.utils.errors import DeserializationError


# ---------------------------------------------------------------------------
# generic projective / uncompressed forms
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["projective", "uncompressed"])
@pytest.mark.parametrize("endianness", ["big", "little"])
def test_g1_serialize_roundtrip(fmt, endianness):
    curve = BLS12381Pairing.g1_curve
    pt = curve.generator() * 7
    data = serialize_point(pt, fmt, endianness)
    nb = curve.field.params.num_bytes
    assert len(data) == (3 if fmt == "projective" else 2) * nb
    back = deserialize_point(curve, data, fmt, endianness)
    assert back == pt


def test_g1_serialize_neutral_roundtrip():
    curve = BN254Pairing.g1_curve
    data = serialize_point(curve.neutral(), "projective", "big")
    back = deserialize_point(curve, data, "projective", "big")
    assert back.is_neutral_element()


def test_deserialize_rejects_off_curve():
    curve = BLS12381Pairing.g1_curve
    nb = curve.field.params.num_bytes
    bad = (5).to_bytes(nb, "big") + (7).to_bytes(nb, "big")
    with pytest.raises(DeserializationError):
        deserialize_point(curve, bad, "uncompressed", "big")


def test_deserialize_rejects_wrong_length():
    curve = BLS12381Pairing.g1_curve
    with pytest.raises(DeserializationError):
        deserialize_point(curve, b"\x00" * 17, "projective", "big")


# ---------------------------------------------------------------------------
# G1 compression
# ---------------------------------------------------------------------------

# Zcash-format compressed BLS12-381 G1 generator (reference compress_g1_point
# output; e.g. draft-irtf-cfrg-pairing-friendly-curves test vector).
BLS_G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)


def test_bls12_381_g1_generator_compressed_kat():
    g = BLS12381Pairing.g1_curve.generator()
    assert compress_g1("bls12_381", g) == BLS_G1_GEN_COMPRESSED
    assert decompress_g1("bls12_381", BLS_G1_GEN_COMPRESSED) == g


@pytest.mark.parametrize("curve_name,cfg", [
    ("bls12_381", BLS12381Pairing), ("bn254", BN254Pairing)])
@pytest.mark.parametrize("k", [1, 2, 5, 11])
def test_g1_compress_roundtrip(curve_name, cfg, k):
    pt = cfg.g1_curve.generator() * k
    data = compress_g1(curve_name, pt)
    assert len(data) == (48 if curve_name == "bls12_381" else 32)
    assert decompress_g1(curve_name, data) == pt


@pytest.mark.parametrize("curve_name,cfg", [
    ("bls12_381", BLS12381Pairing), ("bn254", BN254Pairing)])
def test_g1_compress_infinity(curve_name, cfg):
    data = compress_g1(curve_name, cfg.g1_curve.neutral())
    assert decompress_g1(curve_name, data).is_neutral_element()


def test_g1_decompress_rejects_uncompressed_flag():
    data = bytearray(compress_g1("bls12_381",
                                 BLS12381Pairing.g1_curve.generator()))
    data[0] &= 0x7F  # clear the compressed bit
    with pytest.raises(DeserializationError):
        decompress_g1("bls12_381", bytes(data))


def test_g1_decompress_rejects_non_curve_x():
    # x = 5 is not on BLS12-381 (5^3 + 4 is not a QR)
    curve = BLS12381Pairing.g1_curve
    p = curve.field.p
    for x in range(2, 40):
        y2 = (x ** 3 + 4) % p
        if curve.field.params.sqrt(y2) is None:
            data = bytearray(x.to_bytes(48, "big"))
            data[0] |= 0x80
            with pytest.raises(DeserializationError):
                decompress_g1("bls12_381", bytes(data))
            return
    pytest.skip("no small non-curve x found")


# ---------------------------------------------------------------------------
# G2 compression
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve_name,cfg", [
    ("bls12_381", BLS12381Pairing), ("bn254", BN254Pairing)])
@pytest.mark.parametrize("k", [1, 3, 9])
def test_g2_compress_roundtrip(curve_name, cfg, k):
    pt = cfg.g2_generator().mul(k)
    data = compress_g2(curve_name, pt)
    assert len(data) == (96 if curve_name == "bls12_381" else 64)
    back = decompress_g2(curve_name, data)
    assert back.x == pt.x and back.y == pt.y


@pytest.mark.parametrize("curve_name,cfg", [
    ("bls12_381", BLS12381Pairing), ("bn254", BN254Pairing)])
def test_g2_compress_infinity(curve_name, cfg):
    inf = AffinePoint.infinity(cfg.fp2)
    data = compress_g2(curve_name, inf)
    assert decompress_g2(curve_name, data).inf


def test_g2_sign_bit_distinguishes_negation():
    cfg = BLS12381Pairing
    q = cfg.g2_generator().mul(4)
    q_neg = q.neg()
    d1 = compress_g2("bls12_381", q)
    d2 = compress_g2("bls12_381", q_neg)
    assert d1[1:] == d2[1:] and d1[0] != d2[0]
    assert decompress_g2("bls12_381", d2).y == q_neg.y


# ---------------------------------------------------------------------------
# Fp2 sqrt (Algorithm 8) against squares
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg", [BLS12381Pairing, BN254Pairing],
                         ids=["bls12_381", "bn254"])
def test_sqrt_fp2_roundtrip(cfg):
    fp2 = cfg.fp2
    for c0, c1 in [(3, 7), (12345, 678), (1, 0), (0, 2)]:
        v = fp2((c0, c1))
        sq = v * v
        for bit in (0, 1):
            r = sqrt_fp2(fp2, sq, bit)
            assert r is not None and r * r == sq
        # the two bits give the two distinct roots when v != -v
        r0 = sqrt_fp2(fp2, sq, 0)
        r1 = sqrt_fp2(fp2, sq, 1)
        assert r0 == -r1 or r0 == r1


def test_sqrt_fp2_nonsquare_returns_none():
    fp2 = BLS12381Pairing.fp2
    # u is a non-square in Fp2 for the BLS tower (norm(u) = 1... check by
    # scanning small elements for a provable non-square via sqrt failure)
    found = False
    for c0, c1 in [(2, 1), (3, 5), (7, 11), (1, 1)]:
        v = fp2((c0, c1))
        r = sqrt_fp2(fp2, v, 0)
        if r is None:
            found = True
            break
        assert r * r == v
    assert found, "expected at least one non-square among the samples"
