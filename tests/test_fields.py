"""Field arithmetic: batched digit kernels vs the exact integer oracle.

Mirrors the reference's per-field axiom/known-answer unit tests
(e.g. ``math/src/field/fields/fft_friendly/babybear.rs`` test mods) plus
randomized differential coverage in the spirit of its proptest suites.
"""

import random

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.fields import (
    ALL_FIELDS, BabyBear, Goldilocks, Mersenne31, Stark252, BLS12381Field,
    FieldElement,
)

FIELDS = [
    ALL_FIELDS["stark252"],
    ALL_FIELDS["babybear"],
    ALL_FIELDS["mersenne31"],
    ALL_FIELDS["goldilocks"],
    ALL_FIELDS["bls12_381_base"],
    ALL_FIELDS["bn254_scalar"],
    ALL_FIELDS["secp256k1_base"],
    ALL_FIELDS["f17"],
]

B = 17  # deliberately non-aligned batch size


def rand_elems(fp, n, seed):
    rng = random.Random(seed)
    # bias towards edge cases
    edge = [0, 1, 2, fp.p - 1, fp.p - 2, fp.p // 2]
    vals = [rng.choice(edge) if rng.random() < 0.25 else rng.randrange(fp.p)
            for _ in range(n)]
    return vals


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_roundtrip(fp):
    vals = rand_elems(fp, B, 1)
    arr = fp.array(vals)
    back = fp.to_ints(arr)
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(fp):
    a_vals = rand_elems(fp, B, 2)
    b_vals = rand_elems(fp, B, 3)
    a, b = fp.array(a_vals), fp.array(b_vals)
    assert list(fp.to_ints(fp.add(a, b))) == [(x + y) % fp.p for x, y in zip(a_vals, b_vals)]
    assert list(fp.to_ints(fp.sub(a, b))) == [(x - y) % fp.p for x, y in zip(a_vals, b_vals)]
    assert list(fp.to_ints(fp.neg(a))) == [(-x) % fp.p for x in a_vals]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_mul(fp):
    a_vals = rand_elems(fp, B, 4)
    b_vals = rand_elems(fp, B, 5)
    a, b = fp.array(a_vals), fp.array(b_vals)
    assert list(fp.to_ints(fp.mul(a, b))) == [(x * y) % fp.p for x, y in zip(a_vals, b_vals)]
    assert list(fp.to_ints(fp.square(a))) == [(x * x) % fp.p for x in a_vals]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_pow_inv(fp):
    a_vals = [v if v else 1 for v in rand_elems(fp, 5, 6)]
    a = fp.array(a_vals)
    assert list(fp.to_ints(fp.pow(a, 5))) == [pow(x, 5, fp.p) for x in a_vals]
    # large-exponent scan path + Fermat inversion
    inv = fp.inv(a)
    assert list(fp.to_ints(inv)) == [pow(x, -1, fp.p) for x in a_vals]


@pytest.mark.parametrize("fp", [Stark252, BabyBear, Goldilocks], ids=lambda f: f.name)
def test_batch_inverse(fp):
    vals = rand_elems(fp, 9, 7)
    vals[3] = 0  # zero maps to zero
    a = fp.array(vals)
    out = fp.to_ints(fp.batch_inverse(a))
    for v, o in zip(vals, out):
        assert int(o) == (pow(v, -1, fp.p) if v else 0)


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_predicates(fp):
    vals = [0, 1, fp.p - 1, 0]
    a = fp.array(vals)
    assert list(np.asarray(fp.is_zero(a))) == [True, False, False, True]
    b = fp.array([0, 2, fp.p - 1, 5])
    assert list(np.asarray(fp.equal(a, b))) == [True, False, True, False]


def test_two_adic_roots_match_reference():
    # Stark252 root from fft_friendly/stark_252_prime_field.rs:22
    w = Stark252.primitive_root_of_unity(2)
    # w^4 == 1, w^2 == -1
    assert (w * w * w * w).value == 1
    assert (w * w).value == Stark252.p - 1
    # BabyBear: 21 has order 2^24 (fft_friendly/babybear.rs:29-31)
    assert pow(21, 1 << 24, BabyBear.p) == 1
    assert pow(21, 1 << 23, BabyBear.p) != 1


def test_host_element_ops():
    f = Stark252
    a, b = f(1234), f("0x5678")
    assert (a + b).value == 1234 + 0x5678
    assert (a * b).inv() * a * b == f(1)
    assert (a - a).is_zero()
    assert (f(2) ** 10).value == 1024
    assert f(-1).value == f.p - 1
    r = f(2).sqrt()
    assert r is not None and (r[0] * r[0]).value == 2
    # serialization roundtrip (32 bytes for Stark252, ByteConversion parity)
    assert len(a.to_bytes_be()) == 32
    assert FieldElement.from_bytes_be(f, a.to_bytes_be()) == a


def test_montgomery_params_sanity():
    for fp in FIELDS:
        pr = fp.params
        assert (pr.r * pr.r_inv) % pr.p == 1
        assert (pr.p * ((-pow(pr.p, -1, 1 << 16)) % (1 << 16))) % (1 << 16) == (-1) % (1 << 16)
        assert pr.p_digits[0] % 2 == 1


def test_named_extension_instances():
    """BabyBear quartic (x^4 = -11, quartic_babybear.rs) and Mersenne31
    Fp2/Fp4 (i^2 = -1; j^2 = 2+i, mersenne31/extensions.rs) as towers."""
    from lambda_elliptic_curves_tpu.fields import (
        BabyBear, Mersenne31,
        BabyBearQuartic, Mersenne31Complex, Mersenne31Quartic,
    )
    z = BabyBearQuartic.from_components(((0, 0), (1, 0)))
    assert z ** 4 == BabyBearQuartic(BabyBear.p - 11)
    i = Mersenne31Complex.from_components((0, 1))
    assert i * i == Mersenne31Complex(Mersenne31.p - 1)
    j = Mersenne31Quartic.from_components(((0, 0), (1, 0)))
    assert j * j == Mersenne31Quartic.from_components(((2, 1), (0, 0)))
    # field structure: multiplicative order divides p^4 - 1, inverses exact
    for F, p in ((BabyBearQuartic, BabyBear.p), (Mersenne31Quartic, Mersenne31.p)):
        x = F.from_components(((3, 5), (7, 11)))
        assert x ** (p ** 4 - 1) == F(1)
        assert x * x.inv() == F(1)


def test_narrow_digit_width_cores():
    """The digit kernels are parametric in digit width: 13/12-bit modes
    accumulate raw products without the lo/hi split (kept selectable for
    hardware where u32 multiplies are cheap — see params._auto_digit_bits).
    Exercises both the compact and the big-batch digit-list cores against
    the integer oracle."""
    import jax
    import jax.numpy as jnp

    from lambda_elliptic_curves_tpu.fields.params import (
        FieldParams, narrow_digit_bits,
    )
    from lambda_elliptic_curves_tpu.fields.zoo import (
        STARK252_PRIME, BLS12_381_PRIME,
    )
    from lambda_elliptic_curves_tpu.ops import limbs

    rng = random.Random(7)
    # (the BLS12-381 K=30 big-batch graph compiles for minutes on a 1-core
    # host, so the digit-list core is exercised on Stark252 only)
    for prime, name, batches in (
        (STARK252_PRIME, "s252", (9, 1 << 13)),
        (BLS12_381_PRIME, "b381", (9,)),
    ):
        d = narrow_digit_bits(prime.bit_length())
        assert d < 16
        fp = FieldParams(name=f"{name}_narrow", p=prime, digit_bits=d)
        assert not fp.split_products
        for batch in batches:  # compact core / digit-list core
            xs = [rng.randrange(prime) for _ in range(batch - 3)] + [
                0, 1, prime - 1]
            ys = [rng.randrange(prime) for _ in range(batch - 3)] + [
                prime - 1, 1, prime - 1]
            am = jnp.asarray(
                limbs.ints_to_digits_np([x * fp.r % prime for x in xs], fp))
            bm = jnp.asarray(
                limbs.ints_to_digits_np([y * fp.r % prime for y in ys], fp))
            mul = limbs.digits_to_ints_np(
                np.asarray(jax.jit(
                    lambda a, b, fp=fp: limbs.mont_mul(a, b, fp))(am, bm)), fp)
            fm = limbs.digits_to_ints_np(
                np.asarray(jax.jit(
                    lambda a, fp=fp: limbs.from_mont(a, fp))(am)), fp)
            check = rng.sample(range(batch), 40) if batch > 64 else range(batch)
            for i in check:
                assert int(mul[i]) == xs[i] * ys[i] * fp.r % prime
                assert int(fm[i]) == xs[i]
