"""Foreign-AIR e2e with faithfully-ported winterfell examples over the
winterfell-compatible field (Goldilocks = Miden Felt), parity:
``provers/winterfell_adapter/src/examples/fibonacci_2_terms.rs`` and
``cubic.rs`` integration tests."""

from lambda_elliptic_curves_tpu.fields import Goldilocks
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.provers.stark import (
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.adapter import AirAdapter
from lambda_elliptic_curves_tpu.provers.stark.examples.winterfell_compat import (
    CubicAir, FibAir2Terms, cubic_trace, fib_2_terms_air, fib_2_terms_trace,
)


def test_fib_2_terms_trace_matches_winterfell_fill():
    # winterfell's build_trace: state = [1, 1]; s0 += s1; s1 += s0
    from lambda_elliptic_curves_tpu.provers.stark.examples.winterfell_compat \
        import _fib_2_terms_columns

    col0, col1 = _fib_2_terms_columns(16)
    # first rows of the sequence: (1,1), (2,3), (5,8), (13,21)
    assert list(zip(col0, col1))[:4] == [(1, 1), (2, 3), (5, 8), (13, 21)]
    assert fib_2_terms_trace(16).num_rows == 8


def test_fib_2_terms_prove_verify():
    air_cls, trace = fib_2_terms_air(16)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(Goldilocks))
    assert verify(air_cls, proof, None, options,
                  DefaultTranscript(Goldilocks))


def test_fib_2_terms_wrong_result_rejected():
    # claim a wrong final result: the boundary assertion fails
    foreign = FibAir2Terms(8, 12345)
    air_cls = AirAdapter.for_foreign(foreign, Goldilocks)
    trace = fib_2_terms_trace(16)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(Goldilocks))
    assert not verify(air_cls, proof, None, options,
                      DefaultTranscript(Goldilocks))


def test_cubic_prove_verify_goldilocks():
    air_cls = AirAdapter.for_foreign(CubicAir(start=2), Goldilocks)
    trace = cubic_trace(8)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(Goldilocks))
    assert verify(air_cls, proof, None, options,
                  DefaultTranscript(Goldilocks))


# ---------------------------------------------------------------------------
# winterfell-compat field shims (math/src/field/fields/winterfell.rs)
# ---------------------------------------------------------------------------

def test_winterfell_felt_is_goldilocks():
    from lambda_elliptic_curves_tpu.fields.winterfell_compat import (
        WinterfellFelt,
    )

    assert WinterfellFelt.p == 2**64 - 2**32 + 1
    assert WinterfellFelt is Goldilocks


def test_winterfell_root_convention():
    from lambda_elliptic_curves_tpu.fields.winterfell_compat import (
        winterfell_root_of_unity,
    )

    p = 2**64 - 2**32 + 1
    for order in (1, 4, 16, 32):
        r = winterfell_root_of_unity(order)
        assert pow(r, 1 << order, p) == 1
        assert pow(r, 1 << (order - 1), p) != 1
    # the f64 TWO_ADIC_ROOT_OF_UNITY derivation: g=7 raised to (p-1)/2^32
    assert winterfell_root_of_unity(32) == pow(7, (p - 1) >> 32, p)


def test_quadfelt_axioms_and_defining_polynomial():
    import random

    from lambda_elliptic_curves_tpu.fields.winterfell_compat import QuadFelt

    x = QuadFelt.x()
    # x^2 = x + 1
    assert x * x == x + QuadFelt.one()
    rng = random.Random(3)
    p = QuadFelt.p
    for _ in range(20):
        a = QuadFelt((rng.randrange(p), rng.randrange(p)))
        b = QuadFelt((rng.randrange(p), rng.randrange(p)))
        c = QuadFelt((rng.randrange(p), rng.randrange(p)))
        assert (a + b) * c == a * c + b * c
        assert a * b == b * a
        assert (a * b) * c == a * (b * c)
        if not a.is_zero():
            assert a * a.inv() == QuadFelt.one()
        assert a ** 5 == a * a * a * a * a


def test_quadfelt_ntt_with_winterfell_root_matches_naive():
    """Base-field NTT under winterfell's root convention: fft_with_root
    output == naive DFT with the same root."""
    import random

    from lambda_elliptic_curves_tpu.fields.winterfell_compat import (
        WinterfellFelt as F, winterfell_root_of_unity,
    )
    from lambda_elliptic_curves_tpu.poly import ntt

    rng = random.Random(7)
    n = 16
    root = winterfell_root_of_unity(4)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    got = [int(v) for v in F.to_ints(
        ntt.fft_with_root(F.array(coeffs), F, root))]
    for j in (0, 1, 5, 15):
        want = sum(c * pow(root, i * j, F.p) for i, c in enumerate(coeffs))
        assert got[j] == want % F.p
