"""Cross-engine NTT differential coverage: Pease (XLA), MXU four-step,
and the Pallas kernel in interpret mode must agree with each other and
with naive evaluation on every supported field/size/ordering — the
counterpart of the reference's GPU differential fuzzers
(``fuzz/metal_fuzz/fuzz_targets/fft_diff``, ``twiddles_generation_diff``)
run engine-vs-engine instead of device-vs-CPU."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lambda_elliptic_curves_tpu.fields import (
    BabyBear, Goldilocks, Stark252, U64TestField,
)
from lambda_elliptic_curves_tpu.poly import ntt, ntt_mxu
from lambda_elliptic_curves_tpu.utils.errors import FFTError


def _naive_dft(field, coeffs, root):
    p = field.p
    n = len(coeffs)
    return [
        sum(coeffs[j] * pow(root, j * k, p) for j in range(n)) % p
        for k in range(n)
    ]


def _rand_coeffs(field, n, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(16), "little") % field.p
            for _ in range(n)]


@pytest.mark.parametrize("field", [Stark252, BabyBear, Goldilocks],
                         ids=lambda f: f.name)
def test_pease_vs_naive_dft(field):
    n = 16
    coeffs = _rand_coeffs(field, n, 1)
    root = field.params.primitive_root_of_unity(4)
    got = [int(v) for v in field.to_ints(ntt.fft(field.array(coeffs), field))]
    assert got == _naive_dft(field, coeffs, root)


@pytest.mark.parametrize("field", [Stark252, BabyBear, Goldilocks],
                         ids=lambda f: f.name)
def test_mxu_vs_pease(field):
    for logn in (4, 8):
        coeffs = field.array(_rand_coeffs(field, 1 << logn, logn))
        a = ntt.fft(coeffs, field)
        b = ntt_mxu.fft(coeffs, field)
        assert bool(jnp.array_equal(a, b)), logn


def test_pallas_interpret_vs_pease_stark252():
    from lambda_elliptic_curves_tpu.poly import ntt_pallas

    os.environ["LWT_NTT_PALLAS"] = "interpret"
    try:
        n = 256
        coeffs = Stark252.array(_rand_coeffs(Stark252, n, 5))
        root = Stark252.params.primitive_root_of_unity(8)
        got = ntt_pallas._local_fft(coeffs, Stark252, root, canonical=True)
        want = ntt._fft_pease(coeffs, Stark252, root, canonical=True)
        assert bool(jnp.array_equal(got, want))
    finally:
        os.environ.pop("LWT_NTT_PALLAS", None)


@pytest.mark.parametrize("field", [Stark252, BabyBear, U64TestField],
                         ids=lambda f: f.name)
def test_fft_ifft_roundtrip(field):
    coeffs = _rand_coeffs(field, 32, 7)
    arr = field.array(coeffs)
    back = ntt.ifft(ntt.fft(arr, field), field)
    assert [int(v) for v in field.to_ints(back)] == [c % field.p
                                                     for c in coeffs]


def test_evaluate_offset_fft_coset_identity():
    """evaluate_offset_fft(c, blowup, n, offset)[j] == p(offset * w^j)."""
    f = Stark252
    n, blowup, offset = 16, 2, 3
    coeffs = _rand_coeffs(f, n, 9)
    evals = ntt.evaluate_offset_fft(f, f.array(coeffs), blowup, n, offset)
    vals = [int(v) for v in f.to_ints(evals)]
    w = f.params.primitive_root_of_unity((n * blowup).bit_length() - 1)
    p = f.p
    for j in (0, 1, 5):
        x = offset * pow(w, j, p) % p
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % p
        assert vals[j] == want


def test_interpolate_offset_fft_inverse_of_evaluate():
    f = Stark252
    n, offset = 32, 7
    coeffs = _rand_coeffs(f, n, 11)
    arr = f.array(coeffs)
    evals = ntt.evaluate_offset_fft(f, arr, 1, n, offset)
    back = ntt.interpolate_offset_fft(f, evals, offset)
    assert [int(v) for v in f.to_ints(back)] == coeffs


def test_compose_fft_matches_substitution():
    """compose_fft(p1, p2) == p1(p2(x)) (``fft/polynomial.rs:130``) —
    host Polynomial in/out."""
    from lambda_elliptic_curves_tpu.poly.polynomial import Polynomial

    f = Stark252
    p1 = Polynomial(f, [3, 0, 2])   # 3 + 2x^2
    p2 = Polynomial(f, [1, 5])      # 1 + 5x
    out = ntt.compose_fft(f, p1, p2)
    for x in (2, 9):
        assert out.evaluate(f(x)) == p1.evaluate(p2.evaluate(f(x)))


@pytest.mark.parametrize("config", ["natural", "natural_inversed",
                                    "bit_reverse", "bit_reverse_inversed"])
def test_twiddle_orders(config):
    """The four RootsConfig orders (``fft/cpu/roots_of_unity.rs:66``)."""
    f = Stark252
    order = 4
    tw = ntt.get_twiddles(f, order, config)
    vals = [int(v) for v in f.to_ints(tw)]
    p = f.p
    w = f.params.primitive_root_of_unity(order)
    n_half = 1 << (order - 1)
    base = [pow(w, i, p) for i in range(n_half)]
    if "inversed" in config:
        base = [pow(v, -1, p) for v in base]
    if config.startswith("bit_reverse"):
        bits = (n_half - 1).bit_length()
        base = [base[int(format(i, f"0{bits}b")[::-1], 2)]
                for i in range(n_half)]
    assert vals == base


def test_fft_rejects_bad_sizes():
    f = Stark252
    with pytest.raises(FFTError):
        ntt.fft(f.array([1, 2, 3]), f)
    # order above two-adicity
    small = BabyBear  # two-adicity 24 in the reduced parameterization
    too_big = small.two_adicity + 1
    if too_big < 28:
        with pytest.raises(FFTError):
            ntt.fft(small.zeros((1 << too_big,)), small)


def test_fft_n1_and_batch_dims():
    f = Stark252
    one = f.array([5])
    assert [int(v) for v in f.to_ints(ntt.fft(one, f))] == [5]
    # batched transform: each row transforms independently
    rows = [_rand_coeffs(f, 8, 13), _rand_coeffs(f, 8, 14)]
    arr = f.array(rows)
    out = f.to_ints(ntt.fft(arr, f))
    for r in range(2):
        single = f.to_ints(ntt.fft(f.array(rows[r]), f))
        assert list(out[r]) == list(single)
