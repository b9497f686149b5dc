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
