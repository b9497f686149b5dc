"""Benchmark suite: the five BASELINE configs, each with a correctness
oracle on the timed path.

Per config, prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N|null, "check": "ok"}
The final line is the headline metric (Stark252 interpolate), matching the
reference's only published table (docs/src/fft/benchmarks.md, BASELINE.md:
Metal GPU on M1 — 1144.9 ms at 2^22, 4652.9 ms at 2^24).

Config selection: BENCH_CONFIGS=ntt,msm,stark,small,groth16 (default all);
BENCH_LOG_N (stark252 NTT size, default 22), BENCH_MSM_LOG (default 18).
A config whose oracle fails reports "check": "FAIL" — the timing of an
incorrect kernel is not a result.
"""

import json
import os
import sys
import time

import numpy as np
import jax

# BENCH_PLATFORM=cpu forces the CPU backend for harness smoke tests
# (env vars alone are too late: the environment pre-imports jax with a
# tunneled TPU backend registered)
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.numpy as jnp


_probe_fns: dict = {}


def _force(out):
    """Force REAL completion of ``out`` (any pytree of device arrays).

    ``block_until_ready`` through the tunneled backend can acknowledge a
    dispatch before the device work finishes (measured: a 2^22 NTT
    "completing" in 0.1 ms).  A data-dependent reduction whose scalar is
    pulled with ``device_get`` cannot lie — the bytes must exist."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "shape") and hasattr(x, "dtype")]
    total = 0
    for x in leaves[:4]:
        key = (x.shape, str(x.dtype))
        pb = _probe_fns.get(key)
        if pb is None:
            pb = _probe_fns[key] = jax.jit(
                lambda a: jnp.sum(a.reshape(-1)[:8].astype(jnp.uint32)))
        total ^= int(jax.device_get(pb(x)))
    return total


def _median_ms(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    _force(out)  # probe compile happens outside the timed region
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[reps // 2] * 1000.0, out


def _emit(row):
    print(json.dumps(row), flush=True)


# global deadline (perf_counter value) set by main(); configs check it
# before starting optional extra work so every config gets to emit at
# least its primary row
_deadline = [float("inf")]


def _remaining() -> float:
    return _deadline[0] - time.perf_counter()


# ---------------------------------------------------------------------------
# config 1 — Stark252 NTT interpolate (headline; BASELINE configs[0])
# ---------------------------------------------------------------------------

NTT_BASELINES_MS = {24: 4652.9, 23: 2340.1, 22: 1144.9, 21: 574.2}


_fold_fns: dict = {}


def _eval_at_points(field, coeffs, points):
    """Evaluate the (K, n) coefficient array at each host-int point by
    even/odd folding: p(x) = e(x^2) + x*o(x^2), log2(n) halving steps of
    elementwise work (~2n muls total per point) — far cheaper to compile
    and run than a powers matrix + modular dot at bench sizes.  Returns a
    list of host ints."""
    levels = coeffs.shape[-1].bit_length() - 1

    def run(arr, xs):  # xs: (levels, K, 1) Montgomery digits, x^(2^i)
        out = arr
        for i in range(levels):
            even = out[..., 0::2]
            odd = out[..., 1::2]
            out = field.add(even, field.mul(
                jnp.broadcast_to(xs[i], odd.shape), odd))
        return out[..., 0]

    key = (field, coeffs.shape[-1])
    fn = _fold_fns.get(key)  # ONE compile shared by all points and engines
    if fn is None:
        fn = _fold_fns[key] = jax.jit(run)
    results = []
    for pt in points:
        sq, x = [], pt % field.p
        for _ in range(levels):
            sq.append(x)
            x = x * x % field.p
        xs = jnp.stack([field.constant(v, (1,)) for v in sq])
        results.append(int(field.to_ints(fn(coeffs, xs))) % field.p)
    return results


def bench_ntt():
    """Times BOTH NTT decompositions (Pease/four-step butterflies and the
    MXU plane-matmul path), spot-checks each against naive DFT points, and
    returns the faster one as the headline row (the other is emitted as a
    secondary metric)."""
    from lambda_elliptic_curves_tpu.fields import Stark252 as f
    from lambda_elliptic_curves_tpu.poly import ntt, ntt_mxu, ntt_pallas

    from lambda_elliptic_curves_tpu.ops import limbs

    log_n = int(os.environ.get("BENCH_LOG_N", "22"))
    n = 1 << log_n
    # input built host-side: the oracle values read from the numpy copy
    # for free (an eager device gather would be a fresh multi-minute
    # remote compile through the tunnel)
    rng = np.random.default_rng(0)
    digits_np = rng.integers(0, 1 << 16, (f.num_digits, n), dtype=np.uint32)
    digits_np[-1] &= np.uint32(0x07FF)
    digits = jnp.asarray(digits_np)

    w = f.params.primitive_root_of_unity(log_n)
    check_js = (0, 1, n // 3)
    points = [pow(w, j, f.p) for j in check_js]
    # raw digit planes are Montgomery-form values; canonicalize on host
    r_inv = pow(f.params.r, f.p - 2, f.p)
    want = [int(v) * r_inv % f.p for v in
            limbs.digits_to_ints_np(digits_np[:, list(check_js)], f.params)]

    def check(coeffs):
        return _eval_at_points(f, coeffs, points) == want

    baseline = NTT_BASELINES_MS.get(log_n)
    rows = []
    impls = {
        "pease": jax.jit(lambda evals: ntt.ifft(evals, f)),
        "mxu": jax.jit(lambda evals: ntt_mxu.ifft(evals, f)),
        "pallas": jax.jit(lambda evals: ntt_pallas.ifft(evals, f)),
    }
    # fastest-known engine FIRST: its row is the headline and must exist
    # whatever happens later
    engines = os.environ.get("BENCH_NTT_ENGINES", "mxu,pallas,pease")
    budget_s = float(os.environ.get("BENCH_NTT_BUDGET_S", "150"))
    t0 = time.perf_counter()
    for name in engines.split(","):
        fn = impls.get(name.strip())
        if fn is None:
            continue
        # the first (fastest-known) engine always runs; later engines are
        # skipped once the per-config budget is spent — checked against
        # BOTH the config budget and the whole-suite deadline, and the
        # deadline keeps a reserve so the other configs still get a turn
        spent = time.perf_counter() - t0
        if rows and (spent > budget_s or _remaining() < 300):
            _emit({"metric": f"ntt_{name}", "skipped": True,
                   "reason": f"ntt budget: {spent:.0f}s spent, "
                             f"{_remaining():.0f}s suite remaining"})
            continue
        try:
            ms, coeffs = _median_ms(fn, digits)
            row = {
                "metric": f"stark252_interpolate_2^{log_n}_{name}",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(baseline / ms, 3) if baseline else None,
                "check": "ok" if check(coeffs) else "FAIL",
            }
        except Exception as e:  # noqa: BLE001 — one broken impl must not
            row = {"metric": f"ntt_{name}", "error": repr(e)[:200]}
        rows.append(row)
        _emit(row)  # emit per engine, immediately — a later timeout can
        # never erase an already-measured number

    good = [r for r in rows if r.get("check") == "ok"]
    if not good:
        return rows[0] if rows else {"metric": "ntt", "error": "no engines"}
    best = min(good, key=lambda r: r["value"])
    headline = {**best, "metric": f"stark252_interpolate_2^{log_n}"}

    # ---- BASELINE target size: 2^24 with the fastest engine ----------
    # (docs/src/fft/benchmarks.md:24 — 4652.9 ms Metal M1 to beat.)
    # Runs after the engine comparison so a compile blowup here can never
    # erase the 2^22 row; needs ~1 GiB input + transform temporaries.
    log_big = int(os.environ.get("BENCH_NTT_BIG_LOG", "24"))
    if log_big > log_n and _remaining() > 240:
        best_name = best["metric"].rsplit("_", 1)[-1]
        try:
            n_big = 1 << log_big
            digits_big = rng.integers(0, 1 << 16, (f.num_digits, n_big),
                                      dtype=np.uint32)
            digits_big[-1] &= np.uint32(0x07FF)
            want_big = [int(v) * r_inv % f.p for v in limbs.digits_to_ints_np(
                digits_big[:, list(check_js)], f.params)]
            dev_big = jnp.asarray(digits_big)
            del digits_big
            ms_big, coeffs_big = _median_ms(impls[best_name], dev_big)
            w_big = f.params.primitive_root_of_unity(log_big)
            pts_big = [pow(w_big, j, f.p) for j in check_js]
            ok_big = _eval_at_points(f, coeffs_big, pts_big) == want_big
            base_big = NTT_BASELINES_MS.get(log_big)
            row_big = {
                "metric": f"stark252_interpolate_2^{log_big}",
                "value": round(ms_big, 2),
                "unit": "ms",
                "vs_baseline": (round(base_big / ms_big, 3)
                                if base_big else None),
                "check": "ok" if ok_big else "FAIL",
                "engine": best_name,
            }
            _emit(row_big)
            if ok_big:
                headline = row_big
            del dev_big, coeffs_big
        except Exception as e:  # noqa: BLE001 — OOM/compile failure at the
            _emit({"metric": f"stark252_interpolate_2^{log_big}",
                   "error": repr(e)[:200]})  # big size must not kill config
    else:
        _emit({"metric": f"stark252_interpolate_2^{log_big}",
               "skipped": True,
               "reason": f"{_remaining():.0f}s suite remaining"})
    return headline


# ---------------------------------------------------------------------------
# config 2 — BabyBear NTT 2^20 + Poseidon Merkle commit (BASELINE configs[1])
# ---------------------------------------------------------------------------

def bench_small_field():
    from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252
    from lambda_elliptic_curves_tpu.poly import ntt
    from lambda_elliptic_curves_tpu.merkle import MerkleTree
    from lambda_elliptic_curves_tpu.merkle.backends import PoseidonBackend

    log_n = int(os.environ.get("BENCH_SMALL_LOG_N", "20"))
    n = 1 << log_n
    f = BabyBear
    rng = np.random.default_rng(2)
    digits = jnp.asarray(rng.integers(
        0, 1 << 12, (f.num_digits, n), dtype=np.uint32))

    fwd = jax.jit(lambda c: ntt.fft(c, f))
    ms_ntt, evals = _median_ms(fwd, digits)

    # oracle: evals[j] == poly(w^j) at 3 points; the fold evaluator reads
    # the coefficient side, the eval side comes through one tiny jitted
    # gather (eager advanced indexing would be its own remote compile)
    w = f.params.primitive_root_of_unity(log_n)
    check_js = (1, 7, n // 5)
    got = _eval_at_points(f, digits, [pow(w, j, f.p) for j in check_js])
    take = jax.jit(lambda e, i: jnp.take(e, i, axis=-1))
    want = [int(v) % f.p for v in
            f.to_ints(take(evals, jnp.asarray(list(check_js))))]
    ok = got == want
    row = {
        "metric": f"babybear_ntt_2^{log_n}",
        "value": round(ms_ntt, 2),
        "unit": "ms",
        "vs_baseline": None,
        "check": "ok" if ok else "FAIL",
    }
    _emit(row)

    # Poseidon (Starknet s128b over Stark252) Merkle commit
    from lambda_elliptic_curves_tpu.ops import limbs

    log_leaves = int(os.environ.get("BENCH_MERKLE_LOG", "16"))
    m = 1 << log_leaves
    fs = Stark252
    leaves_np = np.random.default_rng(3).integers(
        0, 1 << 14, (fs.num_digits, m), dtype=np.uint32)
    leaves = jnp.asarray(leaves_np)
    backend = PoseidonBackend()

    def build(lv):
        # root access syncs the full device build chain (lazy levels)
        return MerkleTree.build(backend, lv).root

    ms_merkle, _root = _median_ms(build, leaves)
    tree = MerkleTree.build(backend, leaves)
    # oracle: inclusion proofs verify on the host path; leaf values read
    # from the numpy copy (a 17 MB device pull + per-element big-int
    # conversion would dominate the config's wall time).  The device
    # array holds Montgomery digits, so divide R back out on the host.
    r_inv = pow(fs.params.r, fs.p - 2, fs.p)
    ok2 = all(
        tree.get_proof_by_pos(i).verify(
            backend, tree.root, i,
            int(limbs.digits_to_ints_np(leaves_np[:, i], fs.params))
            * r_inv % fs.p)
        for i in (0, 5, m - 1)
    )
    return {
        "metric": f"poseidon_merkle_commit_2^{log_leaves}",
        "value": round(ms_merkle, 2),
        "unit": "ms",
        "vs_baseline": None,
        "check": "ok" if ok2 else "FAIL",
    }


# ---------------------------------------------------------------------------
# config 3 — BLS12-381 G1 Pippenger MSM (BASELINE configs[2])
# ---------------------------------------------------------------------------

def bench_msm():
    from lambda_elliptic_curves_tpu.curves.zoo import BLS12381Curve
    from lambda_elliptic_curves_tpu.curves.weierstrass import JacobianOps
    # NOTE: `import ...curves.msm as msm_mod` binds the *function* re-exported
    # by curves/__init__.py (package attr shadows the submodule); import the
    # callable directly.
    from lambda_elliptic_curves_tpu.curves.msm import msm_pippenger

    log_b = int(os.environ.get("BENCH_MSM_LOG", "20"))
    B = 1 << log_b
    curve = BLS12381Curve
    ops = JacobianOps(curve)
    order = curve.order
    f = curve.field
    p = f.p

    base = 1 << min(log_b, 14)
    reps = B // base

    # affine points (i+1)*G incrementally with exact host ints
    g = curve.generator()
    xs = np.empty(base, dtype=object)
    ys = np.empty(base, dtype=object)
    ax, ay = g.x, g.y
    gx, gy = g.x, g.y
    for i in range(base):
        xs[i], ys[i] = ax, ay
        if i + 1 < base:
            lam = (ay - gy) * pow(ax - gx, -1, p) % p if i else (
                3 * ax * ax * pow(2 * ay, -1, p) % p)
            nx = (lam * lam - ax - gx) % p
            ay = (lam * (ax - nx) - ay) % p
            ax = nx

    # tile on the HOST (an eager device jnp.tile at (K, 2^18) is a fresh
    # remote compile through the tunnel); one to-Montgomery program total
    from lambda_elliptic_curves_tpu.ops import limbs

    canon_x = limbs.ints_to_digits_np(xs, f.params)
    canon_y = limbs.ints_to_digits_np(ys, f.params)
    if reps > 1:
        canon_x = np.tile(canon_x, (1, reps))
        canon_y = np.tile(canon_y, (1, reps))
    px = f._jit_to_mont(jnp.asarray(canon_x))
    py = f._jit_to_mont(jnp.asarray(canon_y))
    pz = f.constant(1, (B,))
    pts = (px, py, pz)

    Ks = max(1, -(-order.bit_length() // 16))
    sd_np = np.random.default_rng(1).integers(
        0, 1 << 16, (Ks, B), dtype=np.uint32)
    sd_np[-1] = 0
    sd = jnp.asarray(sd_np)

    # NO outer jit: msm_pippenger stages its own compilation (an outer
    # trace would inline the stage jits back into the >30-min-to-compile
    # monolith; see the STAGED note in curves/msm.py)
    ms, out = _median_ms(lambda sd, pts: msm_pippenger(curve, sd, pts),
                         sd, pts)

    # oracle: scalars s_i pair with point ((i mod base)+1)*G.  The weighted
    # scalar sum folds per digit plane in uint64 (weights < 2^14, digits
    # < 2^16, B = 2^18 terms: max 2^48 per dot — no overflow), so the
    # expected point costs one host scalar-mul, not B big-int products.
    weights = (np.arange(B, dtype=np.uint64) % base) + 1
    planes = sd_np.astype(np.uint64)
    total = sum(
        int(np.dot(planes[d], weights)) << (16 * d) for d in range(Ks)
    ) % order
    want = g * total
    got = ops.to_host(out)[0]
    return {
        "metric": f"bls12_381_g1_msm_2^{log_b}",
        "value": round(B / ms * 1e3, 1),
        "unit": "points/s",
        "vs_baseline": None,
        "check": "ok" if got == want else "FAIL",
        "wall_ms": round(ms, 1),
    }


# ---------------------------------------------------------------------------
# config 4 — STARK Fibonacci prove end-to-end (BASELINE configs[3])
# ---------------------------------------------------------------------------

def bench_stark():
    from lambda_elliptic_curves_tpu.fields import Stark252
    from lambda_elliptic_curves_tpu.fiat_shamir import DefaultTranscript
    from lambda_elliptic_curves_tpu.provers.stark import (
        ProofOptions, prove, verify,
    )
    from lambda_elliptic_curves_tpu.provers.stark.examples.fibonacci import (
        FibonacciPublicInputs, fibonacci_air_for, fibonacci_trace,
    )

    from lambda_elliptic_curves_tpu.provers.stark import prover as prover_mod

    field = Stark252
    air_cls = fibonacci_air_for(field)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions(blowup_factor=4, fri_number_of_queries=32,
                           coset_offset=3, grinding_factor=0)
    logs = [int(v) for v in
            os.environ.get("BENCH_STARK_LOGS", "12,16").split(",")]

    out = None
    for i, log_rows in enumerate(logs):
        if i > 0 and _remaining() < 240:  # larger sizes are optional
            _emit({"metric": f"stark_fib_prove_2^{log_rows}",
                   "skipped": True,
                   "reason": f"{_remaining():.0f}s suite remaining"})
            continue
        rows = 1 << log_rows
        trace = fibonacci_trace(field, [1, 1], rows)
        # one warmup prove (compiles), then a timed prove with the
        # per-phase breakdown attached (VERDICT r3 item 3)
        prove(air_cls, trace, pub, options, DefaultTranscript(field))
        t0 = time.perf_counter()
        proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
        ms = (time.perf_counter() - t0) * 1000.0
        ok = verify(air_cls, proof, pub, options, DefaultTranscript(field))
        row = {
            "metric": f"stark_fib_prove_2^{log_rows}",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": None,
            "check": "ok" if ok else "FAIL",
            "phases_ms": {k: round(v * 1000.0, 1)
                          for k, v in prover_mod.last_timings.items()},
        }
        if out is None:
            out = row
        else:
            _emit(row)
    return out


# ---------------------------------------------------------------------------
# config 5 — Groth16 prove (BASELINE configs[4])
# ---------------------------------------------------------------------------

def bench_groth16():
    import random as _random
    from lambda_elliptic_curves_tpu.fields import zoo as FZ
    from lambda_elliptic_curves_tpu.provers.groth16.r1cs import R1CS
    from lambda_elliptic_curves_tpu.provers.groth16.qap import (
        QuadraticArithmeticProgram,
    )
    from lambda_elliptic_curves_tpu.provers.groth16 import (
        prove as g16_prove, setup as g16_setup_fn, verify as g16_verify,
    )

    # multiplication-chain circuit: w_{i+1} = w_i * w_1, n constraints
    n_constraints = int(os.environ.get("BENCH_G16_CONSTRAINTS", "256"))
    fr = FZ.BLS12381Fr
    r = fr.p
    nvars = n_constraints + 2  # [1, x, x^2, ..., x^{n+1}]
    a_rows, b_rows, c_rows = [], [], []
    for i in range(n_constraints):
        a = [0] * nvars
        b = [0] * nvars
        c = [0] * nvars
        a[i + 1] = 1
        b[1] = 1
        c[i + 2] = 1
        a_rows.append(a)
        b_rows.append(b)
        c_rows.append(c)
    r1cs = R1CS.from_matrices(a_rows, b_rows, c_rows, number_of_inputs=2)
    qap = QuadraticArithmeticProgram.from_r1cs(fr, r1cs)
    x = 3
    witness = [1] + [pow(x, i + 1, r) for i in range(nvars - 1)]
    pk, vk = g16_setup_fn(qap, rng=_random.Random(42))

    t0 = time.perf_counter()
    proof = g16_prove(witness, qap, pk, rng=_random.Random(7))
    ms = (time.perf_counter() - t0) * 1000.0
    ok = g16_verify(vk, proof, witness[:2])
    return {
        "metric": f"groth16_prove_{n_constraints}c",
        "value": round(ms, 1),
        "unit": "ms",
        "vs_baseline": None,
        "check": "ok" if ok else "FAIL",
    }


# ---------------------------------------------------------------------------
# extra — BLS12-381 pairing latency (VERDICT r1: fast-pairing evidence)
# ---------------------------------------------------------------------------

def bench_pairing():
    from lambda_elliptic_curves_tpu.curves.pairings import (
        BLS12381Pairing as cfg, pairing,
    )

    P = cfg.g1_curve.generator()
    Q = cfg.g2_generator()
    # warmup + correctness oracle: bilinearity e(3P, 5Q) == e(P, Q)^15
    e1 = pairing(cfg, P, Q)
    ok = pairing(cfg, P.operate_with_self(3), Q.mul(5)) == e1 ** 15

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pairing(cfg, P, Q)
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[1] * 1000.0
    return {
        "metric": "bls12_381_pairing",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": None,
        "check": "ok" if ok else "FAIL",
    }


# ---------------------------------------------------------------------------
# extra — field-op / EC-op micro-bench matrix (VERDICT r2 item 10;
# reference: math/benches/criterion_field.rs, criterion_elliptic_curve.rs)
# ---------------------------------------------------------------------------

_CHAIN_K = 8


def _chain_ms(step, x0, *rest):
    """Per-op time from a chain of ``_CHAIN_K`` dependent applications in
    ONE jitted program (standalone small-jit timings through the tunnel
    read ~0 ms; a dependent chain amortises the dispatch round trip)."""
    def run(x, *r):
        for _ in range(_CHAIN_K):
            x = step(x, *r)
        return x

    ms, _ = _median_ms(jax.jit(run), x0, *rest)
    return ms / _CHAIN_K


def bench_micro():
    """Per-op device throughput at 2^20 lanes: field mul/add/inv/sqrt for
    Stark252 + BabyBear, and BLS12-381 Jacobian add/double.  Emits one row
    per op so kernel-level regressions are visible between rounds."""
    from lambda_elliptic_curves_tpu.fields import BabyBear, Stark252
    from lambda_elliptic_curves_tpu.curves.zoo import BLS12381Curve
    from lambda_elliptic_curves_tpu.curves.weierstrass import JacobianOps

    lanes = 1 << int(os.environ.get("BENCH_MICRO_LOG", "20"))
    rows = []

    for f in (Stark252, BabyBear):
        rng = np.random.default_rng(11)
        a = jnp.asarray(rng.integers(0, 1 << 12, (f.num_digits, lanes),
                                     dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 12, (f.num_digits, lanes),
                                     dtype=np.uint32))
        ops = {
            "mul": (lambda x, y, _f=f: _f.mul(x, y), (a, b)),
            "add": (lambda x, y, _f=f: _f.add(x, y), (a, b)),
            "inv": (lambda x, _f=f: _f.inv(x), (a,)),
        }
        if hasattr(f, "sqrt"):
            # sqrt then square keeps the chain inside the QR set
            ops["sqrt"] = (lambda x, _f=f: _f.mul(_f.sqrt(x), _f.sqrt(x)),
                           (a,))
        for op, (fn, args) in ops.items():
            try:
                ms = _chain_ms(fn, *args)
                rows.append({
                    "metric": f"micro_{f.params.name}_{op}_2^20",
                    "value": round(ms, 3), "unit": "ms",
                    "vs_baseline": None, "check": "ok",
                })
            except Exception as e:  # noqa: BLE001
                rows.append({"metric": f"micro_{f.params.name}_{op}",
                             "error": repr(e)[:160]})

    # hash throughput (reference: crypto/benches/criterion_poseidon.rs,
    # criterion_merkle.rs): informs whether a Pallas hash kernel could
    # beat the XLA lowering of the same batched program
    try:
        from lambda_elliptic_curves_tpu.hashes import keccak, poseidon
        from lambda_elliptic_curves_tpu.fields import Stark252 as fs

        m = 1 << 16
        leaves = jnp.asarray(np.random.default_rng(13).integers(
            0, 1 << 14, (fs.num_digits, m), dtype=np.uint32))
        ms = _chain_ms(poseidon.hash_single, leaves)
        rows.append({"metric": "micro_poseidon_hash_2^16",
                     "value": round(m / ms * 1e3, 0), "unit": "hashes/s",
                     "vs_baseline": None, "check": "ok"})
        # keccak-f: the XLA fori_loop vs the VMEM-resident pallas kernel
        # (VERDICT r3 item: prove which engine wins with a number)
        from lambda_elliptic_curves_tpu.hashes import keccak_pallas

        st = jnp.asarray(np.random.default_rng(14).integers(
            0, 1 << 32, (25, 2, m), dtype=np.uint32))
        ms = _chain_ms(keccak._keccak_f_xla, st)
        rows.append({"metric": "micro_keccakf_xla_2^16",
                     "value": round(m / ms * 1e3, 0), "unit": "perms/s",
                     "vs_baseline": None, "check": "ok"})
        if keccak_pallas.available((m,)):
            ms = _chain_ms(keccak_pallas.keccak_f, st)
            rows.append({"metric": "micro_keccakf_pallas_2^16",
                         "value": round(m / ms * 1e3, 0),
                         "unit": "perms/s",
                         "vs_baseline": None, "check": "ok"})
        words = jnp.asarray(np.random.default_rng(14).integers(
            0, 1 << 32, (8, m), dtype=np.uint32))
        ms = _chain_ms(lambda w: keccak.keccak256_words(w, 32), words)
        rows.append({"metric": "micro_keccak256_32B_2^16",
                     "value": round(m / ms * 1e3, 0), "unit": "hashes/s",
                     "vs_baseline": None, "check": "ok"})
    except Exception as e:  # noqa: BLE001
        rows.append({"metric": "micro_hashes", "error": repr(e)[:160]})

    try:
        curve = BLS12381Curve
        jops = JacobianOps(curve)
        g = curve.generator()
        from lambda_elliptic_curves_tpu.ops import limbs

        n_pts = min(lanes, 1 << 16)
        f = curve.field
        px = f._jit_to_mont(jnp.asarray(np.tile(
            limbs.ints_to_digits_np(np.array([g.x], object), f.params),
            (1, n_pts))))
        py = f._jit_to_mont(jnp.asarray(np.tile(
            limbs.ints_to_digits_np(np.array([g.y], object), f.params),
            (1, n_pts))))
        pz = f.constant(1, (n_pts,))
        pts = (px, py, pz)
        two_g = jax.jit(jops.double)(pts)
        for op, fn, args in (
                ("double", lambda P: jops.double(P), (pts,)),
                ("add", lambda P, Q: jops.add(P, Q), (pts, two_g))):
            ms = _chain_ms(fn, *args)
            rows.append({
                "metric": f"micro_bls12381_jacobian_{op}_2^{n_pts.bit_length() - 1}",
                "value": round(ms, 3), "unit": "ms",
                "vs_baseline": None, "check": "ok",
            })
    except Exception as e:  # noqa: BLE001
        rows.append({"metric": "micro_bls12381_ec", "error": repr(e)[:160]})

    for r in rows[:-1]:
        _emit(r)
    return rows[-1]


# ---------------------------------------------------------------------------

def main():
    from lambda_elliptic_curves_tpu.utils.jax_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    # Headline (Stark252 NTT interpolate — the only config with a published
    # reference baseline) runs FIRST so a timeout can never starve it; its
    # row is re-emitted as the final line for the driver's last-line parse.
    wanted = os.environ.get(
        "BENCH_CONFIGS", "ntt,stark,msm,small,groth16,pairing,micro"
    ).split(",")
    # (fn, minimum seconds a cold run of the config's PRIMARY row needs —
    # a config is only skipped when less than this remains, so every
    # config emits a number unless the suite is genuinely out of time)
    configs = {
        "ntt": (bench_ntt, 0),       # headline: always runs
        "stark": (bench_stark, 120),
        "msm": (bench_msm, 90),
        "small": (bench_small_field, 60),
        "groth16": (bench_groth16, 45),
        "pairing": (bench_pairing, 30),
        "micro": (bench_micro, 45),
    }
    # r3/r4 data points: the driver's outer timeout did NOT fire at 760s
    # or 1248s (rc=0 both), so 900s of scheduled work + emission overhead
    # is safe and leaves room for the 2^24 headline's cold compile
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()
    _deadline[0] = t_start + budget_s
    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        n_cached = len(os.listdir(cache_dir)) if cache_dir else -1
    except OSError:
        n_cached = -1
    _emit({"metric": "bench_env", "platform": jax.default_backend(),
           "budget_s": budget_s, "cache_entries": n_cached})
    results = []
    headline = None
    names = [n.strip() for n in wanted if configs.get(n.strip())]
    for pos, name in enumerate(names):
        fn, min_s = configs[name]
        # r4 regression: one config (msm) overran by 500 s and the naive
        # `remaining < min_s` check then skipped EVERY later config.  The
        # reserve is the sum of the minimum spends of the configs still
        # queued — a config only starts if the ones behind it keep theirs.
        reserve = sum(configs[m][1] for m in names[pos + 1:])
        if headline is not None and _remaining() < min_s + reserve:
            row = {"metric": name, "skipped": True,
                   "reason": (f"{_remaining():.0f}s left < {min_s}s min "
                              f"+ {reserve}s reserve")}
            results.append(row)
            _emit(row)
            continue
        t_cfg = time.perf_counter()
        try:
            row = fn()
        except Exception as e:  # noqa: BLE001 — a broken config must not
            row = {"metric": name, "error": repr(e)[:300]}  # kill the rest
        row["config_wall_s"] = round(time.perf_counter() - t_cfg, 1)
        results.append(row)
        _emit(row)
        if name.strip() == "ntt":
            headline = row
    try:
        n_after = len(os.listdir(cache_dir)) if cache_dir else -1
    except OSError:
        n_after = -1
    _emit({"metric": "bench_env_end", "cache_entries": n_after,
           "total_wall_s": round(time.perf_counter() - t_start, 1)})
    try:
        with open("bench_results.json", "w") as fh:
            json.dump(results, fh, indent=1)
    except OSError:
        pass
    if headline is not None and "error" not in headline:
        _emit(headline)  # final line = headline metric (driver parses last)


if __name__ == "__main__":
    main()
