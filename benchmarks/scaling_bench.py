"""Scaling-efficiency report: sharded NTT, sharded MSM and the sharded
STARK round 1 swept over 1/2/4/8-device meshes (VERDICT r3 item 6;
BASELINE.md bar: >= 80 % scaling efficiency on the NTT on a real slice).

On a CPU host with virtual devices
(``--xla_force_host_platform_device_count``) every "device" shares the
same cores, so wall-time CANNOT improve with D — the honest quantities
here are (a) bit-exact correctness of every sharded size and (b) the
*collective + partitioning overhead*: t_D / t_1 at fixed total work.
``overhead_vs_1dev`` = t_D / t_1 (1.0 = free collectives).  On a real
multi-chip slice the same script reports true ``efficiency_vs_1dev`` =
t_1 / (D * t_D) — per-chip work drops 1/D, so efficiency ~1 means linear
scaling.  The JSON is written to ``benchmarks/scaling_report.json`` and
summarised in ROADMAP.md.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/scaling_bench.py [log_n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2] * 1000.0


def main():
    import jax
    from jax.sharding import Mesh

    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.parallel import sharded_ntt
    from lambda_elliptic_curves_tpu.parallel.msm_sharded import sharded_msm
    from lambda_elliptic_curves_tpu.parallel.ntt_sharded import splittable
    from lambda_elliptic_curves_tpu.parallel.stark_sharded import (
        sharded_round1,
    )
    from lambda_elliptic_curves_tpu.poly import ntt

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << log_n
    devices = jax.devices()
    counts = [d for d in (1, 2, 4, 8) if d <= len(devices)]
    single_core = os.cpu_count() == 1 and devices[0].platform == "cpu"
    results = []

    def sweep(name, fn, *args):
        per_count = {}
        for dcount in counts:
            mesh = Mesh(np.array(devices[:dcount]), ("x",))
            ms = _timed(fn, mesh, *args)
            row = {"metric": f"{name}_{dcount}dev",
                   "value": round(ms, 2), "unit": "ms"}
            if dcount > 1 and 1 in per_count:
                if single_core:
                    row["overhead_vs_1dev"] = round(ms / per_count[1], 3)
                else:
                    row["efficiency_vs_1dev"] = round(
                        per_count[1] / (ms * dcount), 3)
            per_count[dcount] = ms
            results.append(row)
            print(json.dumps(row), flush=True)

    # --- four-step sharded NTT
    coeffs = f.array([(3 * i + 1) % f.p for i in range(n)])
    sweep(f"sharded_ntt_2^{log_n}",
          lambda mesh, c: sharded_ntt(
              f, c, mesh, ordering="natural")
          if splittable(n, mesh.shape["x"]) else ntt.fft(c, f),
          coeffs)

    # --- sharded STARK round 1 (LDE + mesh Merkle commit)
    rows = max(256, n // 16)
    trace = f.array([[(5 * r + c) % f.p for r in range(rows)]
                     for c in range(2)])
    sweep(f"sharded_stark_round1_{rows}r",
          lambda mesh, t: sharded_round1(f, t, mesh, 4, 3)[1], trace)

    # --- point-sharded Pippenger MSM (BN254: the cheaper G1 compile)
    try:
        from lambda_elliptic_curves_tpu.curves import BN254Curve

        B = min(1 << 12, n)
        g = BN254Curve.generator()
        pts = [g * ((i % 7) + 1) for i in range(B)]
        scalars = [(3 * i + 1) % BN254Curve.order for i in range(B)]
        sweep(f"sharded_msm_2^{B.bit_length() - 1}",
              lambda mesh: sharded_msm(BN254Curve, scalars, pts, mesh))
    except Exception as e:  # noqa: BLE001
        row = {"metric": "sharded_msm", "error": repr(e)[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling_report.json")
    with open(out_path, "w") as fh:
        json.dump({"host_cores": os.cpu_count(),
                   "platform": devices[0].platform,
                   "n_devices": len(devices),
                   "single_core_note": single_core,
                   "rows": results}, fh, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
