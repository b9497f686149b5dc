"""NTT correctness at sizes that cross the four-step threshold
(``_FOUR_STEP_MIN`` = 2^14), closing VERDICT r1's "the headline bench path
is untested territory" gap: the suite now exercises the four-step split +
lazy-reduction tiers for Stark252 (lazy tier 2) and BabyBear at 2^15,
cross-checked against the Pease-only path and spot DFT points.
"""

import random

import pytest

from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252
from lambda_elliptic_curves_tpu.poly import ntt
from lambda_elliptic_curves_tpu.poly.ntt import _FOUR_STEP_MIN, _fft_pease
from lambda_elliptic_curves_tpu.poly.polynomial import field_sum

pytestmark = pytest.mark.nightly  # compile-heavy tier


LOG_N = 15
N = 1 << LOG_N
assert N > _FOUR_STEP_MIN


def _random_coeffs(field, n, seed):
    rng = random.Random(seed)
    return field.array([rng.randrange(field.p) for _ in range(n)])


@pytest.mark.parametrize("field", [Stark252, BabyBear], ids=lambda f: f.name)
def test_four_step_matches_pease_oracle(field):
    coeffs = _random_coeffs(field, N, seed=3)
    root = field.params.primitive_root_of_unity(LOG_N)
    got = ntt.fft_with_root(coeffs, field, root)       # four-step path
    want = _fft_pease(coeffs, field, root)             # Pease-only oracle
    assert (field.to_ints(got) == field.to_ints(want)).all()


@pytest.mark.parametrize("field", [Stark252, BabyBear], ids=lambda f: f.name)
def test_large_interpolate_spot_dft_points(field):
    """ifft output evaluated naively at w^j must give back the inputs —
    the same oracle bench.py applies to the timed path."""
    evals = _random_coeffs(field, N, seed=7)
    coeffs = ntt.ifft(evals, field)
    w = field.params.primitive_root_of_unity(LOG_N)
    for j in (0, 1, N // 3):
        pws = ntt.powers(field, pow(w, j, field.p), N)
        got = int(field.to_ints(field_sum(field, field.mul(coeffs, pws))))
        want = int(field.to_ints(evals[..., j]))
        assert got % field.p == want % field.p


def test_large_roundtrip_stark252():
    coeffs = _random_coeffs(Stark252, N, seed=11)
    back = ntt.ifft(ntt.fft(coeffs, Stark252), Stark252)
    assert (Stark252.to_ints(back) == Stark252.to_ints(coeffs)).all()
