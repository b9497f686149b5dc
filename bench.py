"""Benchmark: Stark252 polynomial interpolation (inverse NTT) on one chip.

Headline metric matching the reference's published table
(docs/src/fft/benchmarks.md, BASELINE.md): wall time to interpolate a
polynomial from 2^N evaluations over the Stark252 field, including twiddle
generation and bit-reverse permutation.  Baseline: Metal GPU on M1
(4652.9 ms at 2^24; 1144.9 ms at 2^22).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


BASELINES_MS = {24: 4652.9, 23: 2340.1, 22: 1144.9, 21: 574.2}


def main():
    from lambda_elliptic_curves_tpu.utils.jax_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.poly import ntt

    log_n = int(os.environ.get("BENCH_LOG_N", "22"))
    n = 1 << log_n

    # random-ish evaluations straight on device (avoid slow host conversion)
    key = jax.random.PRNGKey(0)
    digits = jax.random.randint(
        key, (f.num_digits, n), 0, 1 << 16, dtype=jnp.uint32
    )
    # clear the top digit so values are < p (canonical enough for timing and
    # still full-width work)
    digits = digits.at[-1].set(digits[-1] & jnp.uint32(0x07FF))

    interpolate = jax.jit(lambda evals: ntt.ifft(evals, f))
    out = interpolate(digits)
    jax.block_until_ready(out)  # compile + warmup

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(interpolate(digits))
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[1] * 1000.0

    baseline = BASELINES_MS.get(log_n)
    vs = (baseline / ms) if baseline else None
    print(json.dumps({
        "metric": f"stark252_interpolate_2^{log_n}",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
