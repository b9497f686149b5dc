"""TPU silicon smoke tests: every kernel-vs-XLA dispatch seam, ~2 min.

Each test targets a failure class that is INVISIBLE on the CPU test rig:

* the Pallas keccak probe running under an ambient jit trace (the round-4
  dispatch bug — ``keccak_pallas.available`` must come back True from
  inside ``_jitted_sponge_words``'s trace, not cache a poisoned False);
* Mosaic lowering regressions in the Pallas NTT local kernel;
* engine disagreement between the Pease / MXU / Pallas NTT paths on
  silicon (they share no code with the host oracle);
* the device MSM pipeline (sort + segmented scan) on real hardware.

Reference roles: batched Merkle hashing
(``crypto/src/merkle_tree/backends/field_element_vector.rs``), GPU FFT
(``math/src/fft/gpu/metal/ops.rs:20``), Pippenger
(``math/src/msm/pippenger.rs:19``).
"""

import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_keccak_pallas_probe_true_under_jit():
    """The EXACT round-4 failure path: first keccak_f of the process runs
    inside the jitted sponge.  The probe must pass and the Pallas route
    must engage — any RuntimeWarning from the probe is a failure."""
    from lambda_elliptic_curves_tpu.hashes import keccak, keccak_pallas

    keccak_pallas._probe.cache_clear()
    keccak._jitted_sponge_words.cache_clear()
    B = 2 * keccak_pallas._tile()
    words = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 32, (16, B),
                                          dtype=np.uint32))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        digests = keccak.keccak256_words(words, 64)
        digests.block_until_ready()
    assert keccak_pallas._probe() is True
    # digest correctness vs the host sponge on a few columns
    host_words = np.asarray(words)
    for j in (0, 1, B - 1):
        msg = host_words[:, j].astype("<u4").tobytes()
        want = keccak._keccak256_py(msg)
        got = np.asarray(digests[:, j]).astype("<u4").tobytes()
        assert got == want


def test_ntt_pallas_local_kernel_on_silicon():
    """The Pallas local NTT at its largest supported size vs the XLA
    Pease network — catches Mosaic lowering and numerics regressions."""
    from lambda_elliptic_curves_tpu.fields.zoo import Stark252
    from lambda_elliptic_curves_tpu.poly import ntt, ntt_pallas

    if ntt_pallas._mode() == "off":
        pytest.skip("LWT_NTT_PALLAS=off")
    n = ntt_pallas._MAX_N
    rng = np.random.default_rng(1)
    coeffs_int = [int(x) for x in rng.integers(0, 1 << 63, n)]
    x = Stark252.array(coeffs_int)
    root = Stark252.params.primitive_root_of_unity(n.bit_length() - 1)
    got = ntt_pallas._local_fft(x, Stark252, root, canonical=True)
    want = ntt._fft_pease(x, Stark252, root, canonical=True)
    assert bool(jnp.array_equal(got, want))


def test_ntt_engines_agree_on_silicon():
    """Pease vs MXU four-step at 2^12 on the chip, vs a host-int oracle
    spot check."""
    from lambda_elliptic_curves_tpu.fields.zoo import Stark252
    from lambda_elliptic_curves_tpu.poly import ntt, ntt_mxu

    n = 1 << 12
    rng = np.random.default_rng(2)
    ints = [int(x) for x in rng.integers(0, 1 << 63, n)]
    x = Stark252.array(ints)
    a = ntt.fft(x, Stark252)
    b = ntt_mxu.fft(x, Stark252)
    assert bool(jnp.array_equal(a, b))
    # host oracle at two evaluation points
    p = Stark252.p
    root = Stark252.params.primitive_root_of_unity(12)
    vals = Stark252.to_ints(a)
    for k in (1, n // 3):
        w = pow(root, k, p)
        want = 0
        for c in reversed(ints):
            want = (want * w + c) % p
        assert vals[k] == want


def test_msm_device_pipeline_on_silicon():
    """256-point BLS12-381 G1 MSM through the full device Pippenger vs
    the host double-and-add oracle."""
    import importlib

    msm_mod = importlib.import_module("lambda_elliptic_curves_tpu.curves.msm")
    from lambda_elliptic_curves_tpu.curves.zoo import BLS12381Curve

    rng = np.random.default_rng(3)
    n = 256
    g = BLS12381Curve.generator()
    points = [g * int(k) for k in rng.integers(1, 1 << 16, n)]
    scalars = [int.from_bytes(rng.bytes(32), "little") % BLS12381Curve.order
               for _ in range(n)]
    os.environ["LWT_MSM_HOST_MAX"] = "0"
    try:
        got = msm_mod.msm(BLS12381Curve, scalars, points)
    finally:
        os.environ.pop("LWT_MSM_HOST_MAX", None)
    want = msm_mod.msm_naive_host(scalars, points)
    assert got == want
