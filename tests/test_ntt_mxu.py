"""MXU-native NTT (radix-m DFT steps as integer plane matmuls,
``poly/ntt_mxu.py``) against the Pease/four-step path: same transform,
different hardware decomposition — the TPU answer to the reference's GPU
butterfly kernels (``math/src/gpu/metal/shaders/fft.h.metal``)."""

import random

import pytest

from lambda_elliptic_curves_tpu.fields import BabyBear, Goldilocks, Stark252
from lambda_elliptic_curves_tpu.poly import ntt, ntt_mxu


def _arr(field, n, seed):
    rng = random.Random(seed)
    return field.array([rng.randrange(field.p) for _ in range(n)])


@pytest.mark.parametrize("field", [BabyBear, Stark252, Goldilocks],
                         ids=lambda f: f.name)
@pytest.mark.parametrize("n", [8, 64, 128])
def test_dft_matmul_matches_pease(field, n):
    arr = _arr(field, n, seed=n)
    root = field.params.primitive_root_of_unity(n.bit_length() - 1)
    got = ntt_mxu.fft(arr, field)
    want = ntt.fft_with_root(arr, field, root)
    assert (field.to_ints(got) == field.to_ints(want)).all()


@pytest.mark.parametrize("field", [BabyBear, Stark252],
                         ids=lambda f: f.name)
def test_four_step_recursion_matches(field):
    n = 512  # forces the four-step split above _MXU_BASE
    arr = _arr(field, n, seed=9)
    got = ntt_mxu.fft(arr, field)
    want = ntt.fft(arr, field)
    assert (field.to_ints(got) == field.to_ints(want)).all()


def test_ifft_roundtrip():
    field = Stark252
    arr = _arr(field, 256, seed=13)
    back = ntt_mxu.ifft(ntt_mxu.fft(arr, field), field)
    assert (field.to_ints(back) == field.to_ints(arr)).all()


def test_batched_transform():
    field = BabyBear
    rng = random.Random(21)
    batch = field.array([[rng.randrange(field.p) for _ in range(64)]
                         for _ in range(3)])
    got = ntt_mxu.fft(batch, field)
    root = field.params.primitive_root_of_unity(6)
    want = ntt.fft_with_root(batch, field, root)
    assert (field.to_ints(got) == field.to_ints(want)).all()


def test_plane_split_roundtrip():
    field = Stark252
    arr = _arr(field, 16, seed=3)
    planes = ntt_mxu._digits_to_planes(arr, field, 7)
    # reassemble: sum planes[s] << (7 s) must equal the original values
    vals = [0] * 16
    import numpy as np

    pn = np.asarray(planes)
    for s in range(pn.shape[0]):
        for i in range(16):
            vals[i] += int(pn[s, i]) << (7 * s)
    k = field.params.digit_bits
    orig = [0] * 16
    an = np.asarray(arr)
    for d in range(an.shape[0]):
        for i in range(16):
            orig[i] += int(an[d, i]) << (k * d)
    assert vals == orig
