"""Pallas VMEM-resident NTT kernel vs the XLA Pease oracle.

Runs the kernel in interpreter mode (`LWT_NTT_PALLAS=interpret`) — same
trace, no Mosaic — so CPU tests validate exactly the program the TPU
compiles.  Parity role: the differential GPU-vs-CPU FFT fuzzers of the
reference (``fuzz/metal_fuzz/fuzz_targets/fft_diff.rs``).
"""

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.fields import Stark252
from lambda_elliptic_curves_tpu.poly import ntt, ntt_pallas


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LWT_NTT_PALLAS", "interpret")


def _rand_digits(field, shape, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, field.p, size=shape, dtype=object) \
        if False else [
            int(x) % field.p
            for x in rng.integers(0, 2**63, size=int(np.prod(shape)))
        ]
    return field.array(np.array(vals, dtype=object).reshape(shape))


def test_local_kernel_matches_pease_fft():
    f = Stark252
    n, batch = 256, 4
    x = _rand_digits(f, (batch, n), seed=1)
    got = ntt_pallas.fft(x, f)
    want = ntt.fft(x, f)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_local_kernel_lazy_bound_contract():
    f = Stark252
    n = 256
    x = _rand_digits(f, (n,), seed=2)
    root = f.params.primitive_root_of_unity(8)
    y, bound = ntt_pallas._local_fft(x, f, root, canonical=False)
    assert bound in (2 * f.p, 4 * f.p)
    # representatives reduce to the canonical spectrum
    reduced = ntt._canonicalize(y, bound, f.params)
    want = ntt.fft(x, f)
    assert np.array_equal(np.asarray(reduced), np.asarray(want))


def test_ifft_roundtrip_through_pallas():
    f = Stark252
    n = 256
    x = _rand_digits(f, (n,), seed=3)
    back = ntt_pallas.ifft(ntt_pallas.fft(x, f), f)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_four_step_with_pallas_locals(monkeypatch):
    """Four-step split above the kernel: locals go through Pallas."""
    f = Stark252
    monkeypatch.setattr(ntt, "_FOUR_STEP_MIN", 256)
    monkeypatch.setattr(ntt_pallas, "_MIN_N", 8)
    n = 1024  # splits 32 x 32 local transforms
    x = _rand_digits(f, (n,), seed=4)
    got = ntt_pallas.fft(x, f)
    monkeypatch.setattr(ntt, "_FOUR_STEP_MIN", 1 << 14)
    want = ntt.fft(x, f)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_batch_padding_path():
    """Batch not a multiple of the tile row count exercises the pad."""
    f = Stark252
    n, batch = 256, 3
    x = _rand_digits(f, (batch, n), seed=5)
    got = ntt_pallas.fft(x, f)
    want = ntt.fft(x, f)
    assert np.array_equal(np.asarray(got), np.asarray(want))
