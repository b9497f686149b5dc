"""Attacks on the ``exercises/`` challenges (parity role: the reference's
broken-crypto exercises), plus regression checks that the real framework
components do not share each flaw."""

import random

from exercises import blind_trust, broken_heart, leaky_shamir, mutable_leaves
from lambda_elliptic_curves_tpu.curves import StarkCurve


def test_blind_trust_forgery():
    rng = random.Random(1)
    # The verifier's challenge ignores R, so pick s first and solve for R.
    victim_pub = StarkCurve.generator() * 0xDEADBEEF  # dlog "unknown"
    message = b"pay mallory 1000"
    c = blind_trust._challenge(message)
    s = rng.randrange(1, blind_trust.ORDER)
    R = StarkCurve.generator() * s + (-(victim_pub * c))
    assert blind_trust.verify(victim_pub, message, (R, s))
    # honest proofs still verify (the scheme "works" until attacked)
    x, P = blind_trust.keygen(rng)
    assert blind_trust.verify(P, b"hello", blind_trust.prove(x, b"hello", rng))


def test_broken_heart_key_recovery():
    x = 0x1234567890ABCDEF
    signer = broken_heart.Signer(x)
    m1, m2 = b"first", b"second"
    R1, s1 = signer.sign(m1)
    R2, s2 = signer.sign(m2)
    assert broken_heart.verify(signer.P, m1, (R1, s1))
    # same nonce: s1 - s2 = (c1 - c2) x  =>  x recoverable
    c1 = broken_heart._challenge(R1, signer.P, m1)
    c2 = broken_heart._challenge(R2, signer.P, m2)
    n = broken_heart.ORDER
    recovered = (s1 - s2) * pow(c1 - c2, -1, n) % n
    assert recovered == x % n


def test_leaky_shamir_single_share_recovery():
    secret = 0xC0FFEE
    shares = leaky_shamir.deal(secret, k=5, n=8)
    # honest reconstruction needs 5 shares...
    assert leaky_shamir.reconstruct(shares, 5) == secret
    # ...but one share suffices: p(i) = sum_j c_j i^j with c_{j+1}=A c_j+B
    # is linear in c_0, so solve for c_0 from a single evaluation.
    i, y = shares[2]
    p = leaky_shamir.F.p
    A, B = leaky_shamir.A, leaky_shamir.B
    # c_j = A^j c_0 + B*(A^{j-1}+...+1): split into c0-coefficient and const
    coef, const = 0, 0
    a_pow, geo = 1, 0  # A^j, (A^{j-1}+...+1)
    for j in range(5):
        coef = (coef + a_pow * pow(i, j, p)) % p
        const = (const + B * geo * pow(i, j, p)) % p
        geo = (geo * A + 1) % p
        a_pow = a_pow * A % p
    recovered = (y - const) * pow(coef, -1, p) % p
    assert recovered == secret


def test_mutable_leaves_forgery_and_framework_immunity():
    leaves = [b"alpha", b"bravo", b"charlie", b"delta"]
    levels = mutable_leaves.build(leaves)
    r = mutable_leaves.root(levels)
    # honest proof
    assert mutable_leaves.verify(r, 1, b"bravo", mutable_leaves.prove(levels, 1))
    # forgery: the concatenated child digests of an inner node verify as a
    # "leaf" at half the depth — data that was never committed.
    fake_leaf = levels[0][0] + levels[0][1]
    short_path = [levels[1][1]]
    assert mutable_leaves.verify(r, 0, fake_leaf, short_path)
    # the framework's backend is immune: leaf images are fixed-width
    # field-element bytes, not arbitrary strings
    from lambda_elliptic_curves_tpu.fields import Stark252 as F
    from lambda_elliptic_curves_tpu.merkle.backends import KeccakFieldBackend
    from lambda_elliptic_curves_tpu.merkle.tree import MerkleTree
    be = KeccakFieldBackend(F)
    tree = MerkleTree.build(be, F.array([1, 2, 3, 4]))
    proof = tree.get_proof_by_pos(0)
    assert proof.verify(be, tree.root, 0, 1)
    assert not proof.verify(be, tree.root, 0, 2)


def test_toxic_waste_tau_recovery_and_forgery():
    from exercises import toxic_waste as tw
    from lambda_elliptic_curves_tpu.poly.polynomial import Polynomial

    srs = tw.run_ceremony(seed=0x5A)
    scheme = tw.make_scheme(srs)
    Fr = tw.Fr
    poly = Polynomial(Fr, [7, 3, 0, 1])  # p(x) = x^3 + 3x + 7
    commitment = scheme.commit(poly)
    z = Fr(5)
    y_true = poly.evaluate(z)

    # sanity: the honest opening verifies and a false value does not
    honest = scheme.open(z, y_true, poly)
    assert scheme.verify(z, y_true, commitment, honest)
    y_false = y_true + Fr(1)
    assert not scheme.verify(z, y_false, commitment, honest)

    # the attack: recover tau from the published SRS, forge an opening
    # for the false value, and the verifier accepts it
    tau = tw.recover_tau(srs)
    forged = tw.forge_opening(srs, tau, commitment, int(z), int(y_false))
    assert scheme.verify(z, y_false, commitment, forged)
