"""Device-batched RPO: differential vs the host oracle, MDS strategies,
Merkle backend round trip (parity roles: ``rescue_prime_optimized.rs:30``
MdsMethod variants, ``:192`` permutation, ``:205`` hash; bulk Merkle use
through ``IsMerkleTreeBackend``)."""

import numpy as np
import pytest

from lambda_elliptic_curves_tpu.fields import Goldilocks
from lambda_elliptic_curves_tpu.hashes import rescue_prime as rp
from lambda_elliptic_curves_tpu.hashes import rescue_prime_device as rpd


def test_mds_strategies_identical():
    rng = np.random.default_rng(0)
    for level in (128, 160):
        mat = rp.RescuePrimeOptimized(level)
        ntt = rp.RescuePrimeOptimized(level, mds_method="ntt")
        kar = rp.RescuePrimeOptimized(level, mds_method="karatsuba")
        state = [int(x) for x in rng.integers(0, rp.P, mat.m, dtype=np.uint64)]
        want = mat._apply_mds(state)
        assert ntt._apply_mds(state) == want
        assert kar._apply_mds(state) == want
        # full permutation parity across strategies
        assert ntt.permutation(state) == mat.permutation(state)
        assert kar.permutation(state) == mat.permutation(state)


def test_device_hash_one_width():
    """Quick-tier sponge check: one two-block width vs the host oracle."""
    rng = np.random.default_rng(7)
    host = rp.RescuePrimeOptimized(128)
    row = [int(x) for x in rng.integers(0, rp.P, 9, dtype=np.uint64)]
    cols = Goldilocks.array([[v] for v in row])
    got = Goldilocks.to_ints(rpd.hash_elements_words(cols, 128))
    want = host.hash(row)
    assert [int(got[d, 0]) for d in range(len(want))] == want


def test_device_permutation_matches_host():
    rng = np.random.default_rng(1)
    host = rp.RescuePrimeOptimized(128)
    B = 3
    states = [[int(x) for x in rng.integers(0, rp.P, host.m, dtype=np.uint64)]
              for _ in range(B)]
    # (K, m, B) Montgomery digits, column b = state b
    cols = Goldilocks.array([[s[i] for s in states]
                         for i in range(host.m)])
    out = rpd.permutation_words(cols)
    got = Goldilocks.to_ints(out)
    for b in range(B):
        want = host.permutation(states[b])
        assert [int(got[i, b]) for i in range(host.m)] == want


@pytest.mark.nightly  # one compiled sponge per width: minutes on the CPU rig
def test_device_hash_matches_host_all_widths():
    # widths cover: sub-rate (padding path), exact rate, rate+2 (two-block
    # + padding); each width is a separate compiled sponge, so the sweep
    # is kept small for the CPU rig (the TPU tier re-checks one width)
    rng = np.random.default_rng(2)
    for level, widths in ((128, (3, 8, 10)), (160, (10,))):
        host = rp.RescuePrimeOptimized(level)
        for ncols in widths:
            B = 2
            rows = [[int(x) for x in rng.integers(0, rp.P, ncols, dtype=np.uint64)]
                    for _ in range(B)]
            cols = Goldilocks.array([[r[i] for r in rows]
                         for i in range(ncols)])
            out = rpd.hash_elements_words(cols, level)
            got = Goldilocks.to_ints(out)
            for b in range(B):
                want = host.hash(rows[b])
                assert [int(got[d, b]) for d in range(len(want))] == want


@pytest.mark.nightly  # tree levels compile per shape: ~6 min on the CPU rig
def test_rpo_merkle_backend_roundtrip():
    from lambda_elliptic_curves_tpu.merkle import MerkleTree
    from lambda_elliptic_curves_tpu.merkle.backends import RescuePrimeBackend

    backend = RescuePrimeBackend()
    rng = np.random.default_rng(3)
    rows = [[int(x) for x in rng.integers(0, rp.P, 3, dtype=np.uint64)]
            for _ in range(8)]
    leaves = Goldilocks.array([[r[i] for r in rows]
                           for i in range(3)])  # (K, 3, 8)
    tree = MerkleTree.build(backend, leaves)
    root = tree.root
    for pos in (0, 3, 7):
        proof = tree.get_proof_by_pos(pos)
        assert proof.verify(backend, root, pos, rows[pos])
        assert not proof.verify(backend, root, pos,
                                [v + 1 for v in rows[pos]])
