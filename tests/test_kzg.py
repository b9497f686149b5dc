"""KZG commit/open/verify round trips (parity with
``crypto/src/commitments/kzg.rs`` tests)."""

import pytest

from lambda_elliptic_curves_tpu.commitments import (
    KateZaveruchaGoldberg, StructuredReferenceString,
)
from lambda_elliptic_curves_tpu.curves.pairings import BN254Pairing
from lambda_elliptic_curves_tpu.fields import BN254Fr
from lambda_elliptic_curves_tpu.poly import Polynomial


@pytest.fixture(scope="module")
def kzg():
    srs = StructuredReferenceString.insecure_setup(BN254Pairing, 8, tau=941)
    return KateZaveruchaGoldberg(BN254Pairing, srs, msm_method="naive")


def test_commit_open_verify(kzg):
    fr = BN254Fr
    p = Polynomial(fr, [1, 2, 3, 4])
    x = fr(5)
    y = p.evaluate(x)
    commitment = kzg.commit(p)
    proof = kzg.open(x, y, p)
    assert kzg.verify(x, y, commitment, proof)
    # wrong evaluation is rejected
    assert not kzg.verify(x, y + fr(1), commitment, proof)


def test_batch_open_verify(kzg):
    fr = BN254Fr
    p1 = Polynomial(fr, [1, 2, 3])
    p2 = Polynomial(fr, [7, 0, 5, 2])
    x = fr(3)
    ys = [p1.evaluate(x), p2.evaluate(x)]
    ups = fr(99)
    c1, c2 = kzg.commit(p1), kzg.commit(p2)
    proof = kzg.open_batch(x, ys, [p1, p2], ups)
    assert kzg.verify_batch(x, ys, [c1, c2], proof, ups)
    assert not kzg.verify_batch(x, [ys[0], ys[1] + fr(1)], [c1, c2], proof, ups)


def test_srs_file_roundtrip(tmp_path):
    """SRS binary file load/store (``kzg.rs:40`` from_file parity)."""
    from lambda_elliptic_curves_tpu.commitments.kzg import (
        StructuredReferenceString,
    )
    srs = StructuredReferenceString.insecure_setup(BN254Pairing, 4, tau=7)
    path = tmp_path / "srs.bin"
    srs.to_file(str(path))
    back = StructuredReferenceString.from_file(BN254Pairing, str(path))
    assert len(back.powers_main_group) == 4
    assert all(a.to_affine().x == b.to_affine().x
               for a, b in zip(srs.powers_main_group, back.powers_main_group))
    assert back.powers_secondary_group[1].y == srs.powers_secondary_group[1].y


# ---------------------------------------------------------------------------
# reference binary SRS format (kzg.rs AsBytes/Deserializable layout,
# KAT fixture: the reference's own crypto/src/commitments/test_srs/
# srs_3_g1_elements.bin)
# ---------------------------------------------------------------------------

def _fixture_bytes():
    import pathlib

    return (pathlib.Path(__file__).parent / "fixtures" /
            "srs_3_g1_elements.bin").read_bytes()


def test_reference_srs_fixture_parses():
    from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing

    cfg = BLS12381Pairing
    srs = StructuredReferenceString.deserialize_reference(
        cfg, _fixture_bytes())
    assert len(srs.powers_main_group) == 3
    # tau^0 G1 is the BLS12-381 generator
    g = cfg.g1_curve.generator()
    assert srs.powers_main_group[0].to_affine() == g
    # all points landed on curve/twist (deserialize validates); the G2
    # pair must be [G2, tau*G2] for SOME tau: check both are in the
    # subgroup surface (on twist) and first equals the twist generator
    assert srs.powers_secondary_group[0] == cfg.g2_generator()


def test_reference_srs_g1_roundtrip_byte_exact():
    from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing

    cfg = BLS12381Pairing
    raw = _fixture_bytes()
    srs = StructuredReferenceString.deserialize_reference(cfg, raw)
    out = srs.serialize_reference()
    # G1 section re-serializes byte-for-byte (projective representatives
    # are preserved); the G2 section is re-emitted affine-normalised, so
    # compare it by re-parsing
    nb = 48
    g1_end = 12 + 3 * 3 * nb
    assert out[:g1_end] == raw[:g1_end]
    again = StructuredReferenceString.deserialize_reference(cfg, out)
    assert again.powers_secondary_group[0] == srs.powers_secondary_group[0]
    assert again.powers_secondary_group[1] == srs.powers_secondary_group[1]


def test_reference_srs_rejects_corruption():
    from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing
    from lambda_elliptic_curves_tpu.utils.errors import DeserializationError

    cfg = BLS12381Pairing
    raw = bytearray(_fixture_bytes())
    raw[20] ^= 1  # corrupt a G1 x-coordinate byte
    with pytest.raises(DeserializationError):
        StructuredReferenceString.deserialize_reference(cfg, bytes(raw))
    short = _fixture_bytes()[:-1]
    with pytest.raises(DeserializationError):
        StructuredReferenceString.deserialize_reference(cfg, short)


def test_reference_srs_kzg_end_to_end(tmp_path):
    """Drive KZG with an SRS written+read in the reference format."""
    from lambda_elliptic_curves_tpu.curves.pairings import BLS12381Pairing
    from lambda_elliptic_curves_tpu.fields.zoo import BLS12381Fr

    cfg = BLS12381Pairing
    srs = StructuredReferenceString.insecure_setup(cfg, 8, tau=1234)
    path = tmp_path / "srs_ref.bin"
    srs.to_file(str(path), format="reference")
    back = StructuredReferenceString.from_file(cfg, str(path),
                                               format="reference")
    kzg = KateZaveruchaGoldberg(cfg, back, msm_method="naive")
    fr = BLS12381Fr
    poly = Polynomial(fr, [9, 8, 7])
    x = fr(3)
    y = poly.evaluate(x)
    proof = kzg.open(x, y, poly)
    assert kzg.verify(x, y, kzg.commit(poly), proof)
