"""Pedersen, RPO, Monolith, hash_to_field, multilinear polynomial tests."""

from lambda_elliptic_curves_tpu.fields import BabyBear, Goldilocks, Stark252
from lambda_elliptic_curves_tpu.hashes import (
    MonolithMersenne31, RescuePrimeOptimized, hash_to_field, pedersen_hash,
    sha3,
)
from lambda_elliptic_curves_tpu.poly.multilinear import (
    DenseMultilinearPolynomial, SparseMultilinearPolynomial,
)


def test_pedersen_starknet_kat():
    # crypto/src/hash/pedersen/mod.rs test vector
    x = 0x03D937C035C878245CAF64531A5756109C53068DA139362728FEB561405371CB
    y = 0x0208A0A10250E382E1E4BBE2880906C2791BF6275695E02FBBC6AEFF9CD8B31A
    assert pedersen_hash(x, y) == int(
        "30e480bed5fe53fa909cc0f8c4d99b8f9f2c016be4c41e13a4848797979c662", 16
    )


def test_rpo_sbox_and_padding():
    from lambda_elliptic_curves_tpu.hashes.rescue_prime import (
        ALPHA, ALPHA_INV, P,
    )

    assert pow(pow(98765, ALPHA, P), ALPHA_INV, P) == 98765
    rpo = RescuePrimeOptimized(128)
    assert rpo.hash_bytes(b"\x01\x02\x03") != rpo.hash_bytes(b"\x01\x02\x03\x00")
    assert len(rpo.hash(list(range(8)))) == 4
    assert rpo.hash(list(range(8))) == rpo.hash(list(range(8)))
    assert len(RescuePrimeOptimized(160).hash(list(range(3)))) == 5


def test_monolith_plonky3_kat():
    m = MonolithMersenne31(16, 5)
    out = m.concrete(list(range(16)))
    assert out == [
        3470365, 3977394, 4042151, 4025740, 4431233, 4264086, 3927003,
        4259216, 3872757, 3957178, 3820319, 3690660, 4023081, 3592814,
        3688803, 3928040,
    ]
    state = m.permutation(list(range(16)))
    assert len(state) == 16 and all(0 <= v < (1 << 31) - 1 for v in state)


def test_hash_to_field_deterministic():
    data = sha3.expand_message_xmd(b"helloworld", b"dsttest", 500)
    elems = hash_to_field(Goldilocks, data, 40)
    elems2 = hash_to_field(Goldilocks, data, 40)
    assert elems == elems2 and len(elems) == 40
    assert all(0 <= e.value < Goldilocks.p for e in elems)


def test_dense_multilinear():
    f = BabyBear
    # f(x1, x2) evaluations on cube in order (00, 01, 10, 11)
    poly = DenseMultilinearPolynomial(f, [1, 2, 3, 4])
    assert poly.num_vars == 2
    # evaluate at corners
    assert poly.evaluate([f(0), f(0)]).value == 1
    assert poly.evaluate([f(0), f(1)]).value == 2
    assert poly.evaluate([f(1), f(0)]).value == 3
    assert poly.evaluate([f(1), f(1)]).value == 4
    # multilinear interpolation at a random point matches direct formula
    r1, r2 = f(5), f(9)
    expect = (
        (f(1) - r1) * (f(1) - r2) * f(1) + (f(1) - r1) * r2 * f(2)
        + r1 * (f(1) - r2) * f(3) + r1 * r2 * f(4)
    )
    assert poly.evaluate([r1, r2]) == expect
    assert poly.sum_over_hypercube().value == 10
    # fix_variable halves
    fixed = poly.fix_variable(f(1))
    assert len(fixed) == 2


def test_sparse_multilinear():
    f = BabyBear
    dense = DenseMultilinearPolynomial(f, [0, 7, 0, 11])
    sparse = SparseMultilinearPolynomial(f, 2, [(1, 7), (3, 11)])
    for pt in ([f(0), f(1)], [f(3), f(8)]):
        assert sparse.evaluate(pt) == dense.evaluate(pt)
