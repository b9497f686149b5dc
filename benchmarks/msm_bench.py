"""BLS12-381 G1 Pippenger MSM benchmark.

Points are generated incrementally on host (P_i = P_{i-1} + G, one exact
add per point — device-side generation needs a huge double-and-add scan
body that takes tens of minutes to compile on this 1-core host) and
converted to digit arrays once; for B > 2^16 the base set is tiled (the
bucket pipeline is insensitive to duplicate points, and the host oracle
accounts for the tiling).  The MSM itself runs entirely on device; the
result is checked against (sum s_i k_i mod r) * G with exact host ints.

Usage: python benchmarks/msm_bench.py [LOG_B]
"""

import importlib
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lambda_elliptic_curves_tpu.curves.zoo import BLS12381Curve
from lambda_elliptic_curves_tpu.curves.weierstrass import JacobianOps

msm_mod = importlib.import_module('lambda_elliptic_curves_tpu.curves.msm')

BASE_LOG = 14  # host-generated base points (tiled beyond this)


def main():
    log_b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = 1 << log_b
    curve = BLS12381Curve
    ops = JacobianOps(curve)
    order = curve.order
    f = curve.field
    p = f.p

    base = 1 << min(log_b, BASE_LOG)
    reps = B // base

    t0 = time.perf_counter()
    # affine points (i+1)*G incrementally with exact ints
    g = curve.generator()
    xs = np.empty(base, dtype=object)
    ys = np.empty(base, dtype=object)
    ax, ay = g.x, g.y
    gx, gy = g.x, g.y
    for i in range(base):
        xs[i], ys[i] = ax, ay
        # affine addition (distinct points, never identity in this range)
        if i + 1 < base:
            lam = (ay - gy) * pow(ax - gx, -1, p) % p if i else (
                3 * ax * ax * pow(2 * ay, -1, p) % p)
            nx = (lam * lam - ax - gx) % p
            ay = (lam * (ax - nx) - ay) % p
            ax = nx
    print(f"host point gen: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    px = f.array(list(xs))
    py = f.array(list(ys))
    pz = f.constant(1, (base,))
    if reps > 1:
        px = jnp.tile(px, (1, reps))
        py = jnp.tile(py, (1, reps))
        pz = jnp.tile(pz, (1, reps))
    pts = (px, py, pz)
    print(f"device convert: {time.perf_counter()-t0:.1f}s", flush=True)

    Ks = max(1, -(-order.bit_length() // 16))
    sd = jax.random.randint(jax.random.PRNGKey(1), (Ks, B), 0, 1 << 16,
                            dtype=jnp.int32).astype(jnp.uint32)
    sd = sd.at[-1].set(0)

    # no outer jit: msm_pippenger stages its own compilation (see the
    # STAGED note in curves/msm.py)
    run = lambda sd, pts: msm_mod.msm_pippenger(curve, sd, pts)  # noqa: E731
    t0 = time.perf_counter()
    out = run(sd, pts)
    jax.block_until_ready(out)
    print(f"msm compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(sd, pts))
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[1] * 1e3
    print(f"msm_bls12381_2^{log_b}: {ms:.1f} ms "
          f"({B/ms*1e3:.0f} points/s)", flush=True)

    # oracle: scalars s_i pair with point ((i mod base)+1) * G
    from lambda_elliptic_curves_tpu.ops import limbs

    class _T:
        digit_bits = 16
        digit_mask = 0xFFFF
        num_digits = Ks
        p = 1 << (16 * Ks)  # container only

    sints = limbs.digits_to_ints_np(np.asarray(sd), _T)
    total = sum(int(s) * ((i % base) + 1) for i, s in enumerate(sints)) % order
    want = g * total
    got = ops.to_host(out)[0]
    assert got == want, "MSM result mismatch vs host oracle"
    print("oracle check OK", flush=True)


if __name__ == "__main__":
    main()
