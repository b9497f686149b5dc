"""BLS12-381 G1 Pippenger MSM benchmark (device-only data path).

Builds B = 2^LOG_B points on device as k_i * G (one batched double-and-add
scan), random scalars s_i, runs the bucketed MSM, and checks the result
against (sum s_i k_i mod r) * G computed with exact host ints.

Usage: python benchmarks/msm_bench.py [LOG_B]
"""

import sys
import time

import jax
import jax.numpy as jnp

from lambda_elliptic_curves_tpu.curves.zoo import BLS12381Curve
from lambda_elliptic_curves_tpu.curves.weierstrass import JacobianOps
import importlib
msm_mod = importlib.import_module(
    'lambda_elliptic_curves_tpu.curves.msm')


def main():
    log_b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = 1 << log_b
    curve = BLS12381Curve
    ops = JacobianOps(curve)
    order = curve.order
    Ks = max(1, -(-order.bit_length() // 16))

    key = jax.random.PRNGKey(0)
    kd = jax.random.randint(key, (Ks, B), 0, 1 << 16, dtype=jnp.int32)
    kd = kd.astype(jnp.uint32)
    # clear top digit bits so scalars < 2^(16*(Ks-1)) < order
    kd = kd.at[-1].set(0)
    sd = jax.random.randint(jax.random.PRNGKey(1), (Ks, B), 0, 1 << 16,
                            dtype=jnp.int32).astype(jnp.uint32)
    sd = sd.at[-1].set(0)

    g = curve.generator()
    gx = ops.f.constant(g.x, (B,))
    gy = ops.f.constant(g.y, (B,))
    gz = ops.f.constant(1, (B,))

    # per-lane points P_i = k_i * G via one double-and-add scan
    nbits = 16 * (Ks - 1)

    def make_points(kd):
        def body(acc, bit_index):
            b = nbits - 1 - bit_index
            digit = jax.lax.dynamic_index_in_dim(kd, b // 16, axis=0,
                                                 keepdims=False)
            bit = (digit >> jnp.uint32(b % 16)) & jnp.uint32(1)
            acc = ops.double(acc)
            added = ops.add(acc, (gx, gy, gz))
            return ops.select(bit == 1, added, acc), None

        init = ops.neutral((B,))
        acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
        return acc

    t0 = time.perf_counter()
    pts = jax.jit(make_points)(kd)
    jax.block_until_ready(pts)
    print(f"point gen: {time.perf_counter()-t0:.1f}s", flush=True)

    run = jax.jit(lambda sd, pts: msm_mod.msm_pippenger(curve, sd, pts))
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
          f"({B/ms*1e3:.0f} point-adds-equiv/s)", flush=True)

    # oracle
    import numpy as np
    from lambda_elliptic_curves_tpu.ops import limbs

    class _T:
        digit_bits = 16
        digit_mask = 0xFFFF
        num_digits = Ks
        p = 1 << (16 * Ks)  # container only

    kints = limbs.digits_to_ints_np(np.asarray(kd), _T)
    sints = limbs.digits_to_ints_np(np.asarray(sd), _T)
    total = sum(int(a) * int(b) for a, b in zip(kints, sints)) % order
    want = g * total
    got = ops.to_host(out)[0]
    assert got == want, "MSM result mismatch vs host oracle"
    print("oracle check OK", flush=True)


if __name__ == "__main__":
    main()
