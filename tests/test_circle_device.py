"""Device circle FFT (Mersenne31 single-u32 lanes) vs the exact host path."""

import random

import numpy as np
import jax.numpy as jnp

from lambda_elliptic_curves_tpu.circle.cfft_device import (
    evaluate_cfft_dev, interpolate_cfft_dev,
)
from lambda_elliptic_curves_tpu.circle.polynomial import (
    evaluate_cfft, interpolate_cfft,
)
from lambda_elliptic_curves_tpu.circle.point import M31
from lambda_elliptic_curves_tpu.ops import m31


def test_m31_ops_match_ints():
    rng = random.Random(7)
    xs = [rng.randrange(M31) for _ in range(32)] + [0, 1, M31 - 1]
    ys = [rng.randrange(M31) for _ in range(32)] + [M31 - 1, 0, 1]
    a = jnp.asarray(np.array(xs, np.uint32))
    b = jnp.asarray(np.array(ys, np.uint32))
    assert list(np.asarray(m31.add(a, b))) == [(x + y) % M31 for x, y in zip(xs, ys)]
    assert list(np.asarray(m31.sub(a, b))) == [(x - y) % M31 for x, y in zip(xs, ys)]
    assert list(np.asarray(m31.mul(a, b))) == [(x * y) % M31 for x, y in zip(xs, ys)]
    assert list(np.asarray(m31.neg(a))) == [(-x) % M31 for x in xs]
    got_inv = list(np.asarray(m31.batch_inverse(a)))
    assert got_inv == [pow(x, -1, M31) if x else 0 for x in xs]


def test_device_cfft_matches_host():
    rng = random.Random(8)
    for n in (4, 8, 32):
        coeffs = [rng.randrange(M31) for _ in range(n)]
        want = evaluate_cfft(coeffs)
        got = list(np.asarray(
            evaluate_cfft_dev(jnp.asarray(np.array(coeffs, np.uint32)))
        ))
        assert got == want, n


def test_device_icfft_roundtrip_and_batch():
    rng = random.Random(9)
    n = 16
    batch = [[rng.randrange(M31) for _ in range(n)] for _ in range(3)]
    arr = jnp.asarray(np.array(batch, np.uint32))
    evals = evaluate_cfft_dev(arr)
    back = interpolate_cfft_dev(evals)
    assert np.asarray(back).tolist() == batch
    # cross-check one batch row against the host interpolate (Python ints:
    # the host path does exact int arithmetic, not numpy wraparound)
    host = interpolate_cfft([int(x) for x in np.asarray(evals)[1]])
    assert [int(x) for x in np.asarray(back)[1]] == host
