"""Multi-device tests on the 8-way virtual CPU mesh.

This is the collectives coverage the reference cannot have (it is a
single-process library); the driver's dryrun validates the same path.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252
from lambda_elliptic_curves_tpu.parallel import sharded_ntt
from lambda_elliptic_curves_tpu.poly import ntt

pytestmark = pytest.mark.nightly  # compile-heavy tier


@pytest.fixture
def mesh():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("x",))


@pytest.mark.parametrize("field", [BabyBear, Stark252], ids=lambda f: f.name)
def test_sharded_ntt_matches_single_device(field, mesh):
    rng = random.Random(5)
    n = 256  # N1=16, N2=16 over 8 devices
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    arr = field.array(coeffs)
    expected = field.to_ints(ntt.fft(arr, field))
    got = sharded_ntt(field, arr, mesh, ordering="natural")
    got_ints = field.to_ints(got.reshape(arr.shape[0], n))
    assert [int(v) for v in got_ints] == [int(v) for v in expected]


def test_sharded_ntt_inverse_roundtrip(mesh):
    field = BabyBear
    rng = random.Random(9)
    n = 64
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    arr = field.array(coeffs)
    evals = sharded_ntt(field, arr, mesh, ordering="natural")
    evals = evals.reshape(arr.shape[0], n)
    back = sharded_ntt(field, evals, mesh, ordering="natural", inverse=True)
    back_ints = field.to_ints(back.reshape(arr.shape[0], n))
    assert [int(v) for v in back_ints] == coeffs


@pytest.mark.parametrize("shape,ids", [((2, 4), ("dcn", "ici")),
                                       ((4, 2), ("dcn", "ici"))],
                         ids=["2hosts_4chips", "4hosts_2chips"])
def test_sharded_ntt_2d_dcn_blocking(shape, ids):
    """Hierarchical (DCN x ICI) mesh: the factored ICI+DCN transpose must
    reproduce the flat single-axis result bit-for-bit."""
    from lambda_elliptic_curves_tpu.parallel.ntt_sharded import sharded_ntt_2d

    field = Stark252
    devices = np.array(jax.devices()[:8]).reshape(shape)
    mesh2d = Mesh(devices, ids)
    rng = random.Random(21)
    n = 256
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    arr = field.array(coeffs)
    expected = field.to_ints(ntt.fft(arr, field))
    got = sharded_ntt_2d(field, arr, mesh2d, axis_names=ids,
                         ordering="natural")
    got_ints = field.to_ints(np.asarray(got).reshape(arr.shape[0], n))
    assert [int(v) for v in got_ints] == [int(v) for v in expected]


def test_sharded_ntt_2d_inverse_roundtrip():
    from lambda_elliptic_curves_tpu.parallel.ntt_sharded import sharded_ntt_2d

    field = BabyBear
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2d = Mesh(devices, ("dcn", "ici"))
    rng = random.Random(23)
    n = 64
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    arr = field.array(coeffs)
    evals = sharded_ntt_2d(field, arr, mesh2d, ordering="natural")
    evals = evals.reshape(arr.shape[0], n)
    back = sharded_ntt_2d(field, evals, mesh2d, ordering="natural",
                          inverse=True)
    back_ints = field.to_ints(np.asarray(back).reshape(arr.shape[0], n))
    assert [int(v) for v in back_ints] == coeffs


def test_sharded_msm_matches_host_oracle():
    """Point-sharded Pippenger over the 8-device mesh vs the exact host
    MSM, including the padding path (n not divisible by D)."""
    import random

    import numpy as np
    import jax
    from jax.sharding import Mesh

    from lambda_elliptic_curves_tpu.curves import BN254Curve
    from lambda_elliptic_curves_tpu.curves.msm import msm_naive_host
    from lambda_elliptic_curves_tpu.parallel.msm_sharded import sharded_msm

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    rng = random.Random(13)
    g = BN254Curve.generator()
    scalars = [rng.randrange(1, 10000) for _ in range(11)]
    points = [g * rng.randrange(1, 500) for _ in range(11)]
    got = sharded_msm(BN254Curve, scalars, points, mesh)
    assert got == msm_naive_host(scalars, points)
