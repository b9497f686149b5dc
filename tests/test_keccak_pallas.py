"""Differential tests for the Pallas keccak-f kernel (interpret mode on
the CPU rig; the real-silicon probe in ``keccak_pallas._probe`` re-runs
the same bit-exactness check on TPU before the kernel ever serves a
digest).  Parity role: the reference's GPU-vs-CPU hash differential
tests around ``crypto/src/merkle_tree/backends``."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def interp_env(monkeypatch):
    monkeypatch.setenv("LWT_KECCAK_PALLAS", "interpret")
    monkeypatch.setenv("LWT_KECCAK_PALLAS_TILE", "128")
    from lambda_elliptic_curves_tpu.hashes import keccak_pallas

    # the probe and permute caches key on env-derived values read at call
    # time; clear them so this test's tile/mode take effect
    keccak_pallas._probe.cache_clear()
    keccak_pallas._permute_fn.cache_clear()
    yield
    keccak_pallas._probe.cache_clear()
    keccak_pallas._permute_fn.cache_clear()


def test_pallas_permutation_matches_xla(interp_env):
    from lambda_elliptic_curves_tpu.hashes import keccak, keccak_pallas

    rng = np.random.default_rng(1)
    # 300 is not a tile multiple: exercises the pad/unpad path
    st = jnp.asarray(rng.integers(0, 1 << 32, (25, 2, 300), dtype=np.uint32))
    assert keccak_pallas.available((300,))
    got = keccak_pallas.keccak_f(st)
    want = keccak._keccak_f_xla(st)
    assert jnp.array_equal(got, want)


def test_pallas_sponge_digests_match_host(interp_env):
    from lambda_elliptic_curves_tpu.hashes import keccak

    rng = np.random.default_rng(2)
    for nb in (32, 64, 200):  # 200 > rate: two permutation calls
        W = -(-nb // 4)
        msgs = rng.integers(0, 1 << 32, (W, 160), dtype=np.uint32)
        if nb % 4:
            msgs[-1] &= (1 << (8 * (nb % 4))) - 1
        dig = np.asarray(keccak.keccak256_words(jnp.asarray(msgs), nb))
        for b in (0, 159):
            raw = b"".join(int(msgs[w, b]).to_bytes(4, "little")
                           for w in range(W))[:nb]
            want = keccak._keccak256_py(raw)
            got = b"".join(int(dig[w, b]).to_bytes(4, "little")
                           for w in range(8))
            assert got == want, (nb, b)
