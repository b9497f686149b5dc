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
