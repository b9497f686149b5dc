"""Prove/verify e2e for the dummy, bit-flags and read-only-memory AIRs
(parity: ``provers/stark/src/examples/{dummy_air,bit_flags,
read_only_memory}.rs`` + the integration tests that drive them)."""

from lambda_elliptic_curves_tpu.fields import Stark252, U64TestField
from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
from lambda_elliptic_curves_tpu.provers.stark import (
    ProofOptions, prove, verify,
)
from lambda_elliptic_curves_tpu.provers.stark.examples.extra_airs import (
    ReadOnlyPublicInputs, bit_flags_air_for, bit_prefix_flag_trace,
    dummy_air_for, dummy_trace, read_only_memory_air_for, sort_rap_trace,
)


def test_dummy_air_prove_verify():
    field = U64TestField
    air_cls = dummy_air_for(field)
    trace = dummy_trace(field, 16)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(field))
    assert verify(air_cls, proof, None, options, DefaultTranscript(field))


def test_bit_flags_prove_verify():
    field = Stark252
    air_cls = bit_flags_air_for(field)
    trace = bit_prefix_flag_trace(field, 4)  # 64 rows
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(field))
    assert verify(air_cls, proof, None, options, DefaultTranscript(field))


def test_bit_flags_bad_trace_rejected():
    """A non-bit prefix difference must break the proof."""
    field = Stark252
    air_cls = bit_flags_air_for(field)
    trace = bit_prefix_flag_trace(field, 4)
    # corrupt a mid-step flag: makes flag - 2*next_flag a non-bit
    from lambda_elliptic_curves_tpu.provers.stark.trace import TraceTable
    cols = trace.to_host_columns()
    cols[0][5] = 7
    trace = TraceTable.from_columns(field, cols)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, None, options, DefaultTranscript(field))
    assert not verify(air_cls, proof, None, options, DefaultTranscript(field))


def _memory_fixture(field):
    addr = [3, 1, 2, 2, 4, 1, 3, 4]
    val_of = {1: 10, 2: 20, 3: 30, 4: 40}
    vals = [val_of[a] for a in addr]
    trace = sort_rap_trace(field, addr, vals)
    pub = ReadOnlyPublicInputs(a0=addr[0], v0=vals[0], a_sorted0=1,
                               v_sorted0=10)
    return trace, pub


def test_read_only_memory_prove_verify():
    field = U64TestField
    air_cls = read_only_memory_air_for(field)
    trace, pub = _memory_fixture(field)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    assert proof.lde_trace_aux_merkle_root is not None
    assert verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_read_only_memory_rejects_non_permutation():
    """Sorted columns that are not a permutation of (a, v) must fail."""
    field = U64TestField
    air_cls = read_only_memory_air_for(field)
    trace, pub = _memory_fixture(field)
    from lambda_elliptic_curves_tpu.provers.stark.trace import TraceTable
    cols = trace.to_host_columns()
    cols[3][3] = (cols[3][3] + 1) % field.p  # tamper one sorted value
    trace = TraceTable.from_columns(field, cols)
    options = ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    assert not verify(air_cls, proof, pub, options, DefaultTranscript(field))


def test_sort_rap_trace_sorts():
    field = U64TestField
    trace, _ = _memory_fixture(field)
    cols = trace.to_host_columns()
    assert cols[2] == sorted(cols[2])
    # (a', v') is a permutation of (a, v)
    assert sorted(zip(cols[2], cols[3])) == sorted(zip(cols[0], cols[1]))
