"""Scaling-efficiency report for the sharded STARK round 1 and the
four-step sharded NTT (VERDICT r1 item 9).

Runs the same workload on a 1-device and a D-device mesh and reports the
parallel efficiency.  On a CPU host with virtual devices
(``--xla_force_host_platform_device_count``) the numbers measure the
collective/partitioning overhead only (all "devices" share the cores), so
the meaningful output there is correctness + overhead; on a real multi-chip
slice the same script reports true scaling.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/scaling_bench.py [log_n]
Prints one JSON line per workload.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from jax.sharding import Mesh

    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.parallel import sharded_ntt
    from lambda_elliptic_curves_tpu.parallel.stark_sharded import (
        sharded_round1,
    )

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << log_n
    devices = jax.devices()
    D = len(devices)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[reps // 2] * 1000.0

    coeffs = f.array([(3 * i + 1) % f.p for i in range(n)])
    results = []
    for name, dcount in (("1dev", 1), (f"{D}dev", D)):
        mesh = Mesh(np.array(devices[:dcount]), ("x",))
        ms = timed(lambda c: sharded_ntt(f, c, mesh, ordering="natural"),
                   coeffs)
        results.append({"metric": f"sharded_ntt_2^{log_n}_{name}",
                        "value": round(ms, 2), "unit": "ms"})

    rows = max(256, n // 16)
    trace = f.array([[(5 * r + c) % f.p for r in range(rows)]
                     for c in range(2)])
    for name, dcount in (("1dev", 1), (f"{D}dev", D)):
        mesh = Mesh(np.array(devices[:dcount]), ("x",))
        ms = timed(lambda t: sharded_round1(f, t, mesh, 4, 3)[1], trace)
        results.append({"metric": f"sharded_stark_round1_{rows}r_{name}",
                        "value": round(ms, 2), "unit": "ms"})

    for pair in (results[:2], results[2:]):
        base, multi = pair
        eff = base["value"] / (multi["value"] * len(devices))
        multi["efficiency_vs_1dev"] = round(eff, 3)
    for row in results:
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
