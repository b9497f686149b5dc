"""Pallas-TPU keccak-f[1600]: VMEM-resident 24-round permutation.

The XLA path (:func:`.keccak._keccak_f_xla`) runs the 24 rounds as a
``fori_loop`` whose carried state — (25, 2, B) uint32, 200·B bytes —
round-trips HBM once per round at large batch: ~24x the ideal traffic
of one read + one write.  Merkle leaf storms hash 2^16-2^22 messages per
level (``crypto/src/merkle_tree/backends/*`` parity role), so keccak is
bandwidth-bound exactly where it matters.

This kernel holds a batch tile of the state in VMEM across ALL rounds:
one HBM read, 24 rounds (an in-kernel ``fori_loop``) of pure elementwise
VPU work (XOR/AND-NOT and 32-bit pair rotates — no cross-lane movement
at all), one HBM write.  The state is viewed as (50, B): row 2i = lane
i lo word, row 2i+1 = hi.

Wiring: :func:`.keccak.keccak_f` dispatches here on TPU backends when
:func:`available` passes (a ONE-TIME eager probe compile — keccak_f is
usually called inside outer jits, where a per-call try/except could not
catch Mosaic lowering failures at the outer compile).  Env knob
``LWT_KECCAK_PALLAS``: ``on`` (default), ``off``, ``interpret`` (forces
interpret mode — the CPU differential-test rig).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import keccak as _k

U32 = jnp.uint32


def _tile() -> int:
    """Batch tile: state block + output block, each 50*T*4 bytes (~400 KB
    at T=2048) — well under VMEM with headroom for rotate temporaries.
    Read per call so test rigs can retune it."""
    return int(os.environ.get("LWT_KECCAK_PALLAS_TILE", "2048"))


def _mode() -> str:
    return os.environ.get("LWT_KECCAK_PALLAS", "on")


def _round(lanes, rc_lo, rc_hi):
    """One keccak round on lanes = list of 25 (lo, hi) pairs; the round
    constant halves are uint32 scalars or lane-broadcast vectors."""
    c = []
    for x in range(5):
        lo = (lanes[x][0] ^ lanes[x + 5][0] ^ lanes[x + 10][0]
              ^ lanes[x + 15][0] ^ lanes[x + 20][0])
        hi = (lanes[x][1] ^ lanes[x + 5][1] ^ lanes[x + 10][1]
              ^ lanes[x + 15][1] ^ lanes[x + 20][1])
        c.append((lo, hi))
    d = []
    for x in range(5):
        rl, rh = _k._rotl64_pair(*c[(x + 1) % 5], 1)
        d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
    lanes = [(lanes[i][0] ^ d[i % 5][0], lanes[i][1] ^ d[i % 5][1])
             for i in range(25)]
    b = [None] * 25
    for x in range(5):
        for y in range(5):
            b[y + 5 * ((2 * x + 3 * y) % 5)] = _k._rotl64_pair(
                *lanes[x + 5 * y], _k._ROTATIONS[x][y])
    lanes = [
        (
            b[x + 5 * y][0]
            ^ (~b[(x + 1) % 5 + 5 * y][0] & b[(x + 2) % 5 + 5 * y][0]),
            b[x + 5 * y][1]
            ^ (~b[(x + 1) % 5 + 5 * y][1] & b[(x + 2) % 5 + 5 * y][1]),
        )
        for y in range(5) for x in range(5)
    ]
    lanes[0] = (lanes[0][0] ^ rc_lo, lanes[0][1] ^ rc_hi)
    return lanes


@functools.lru_cache(maxsize=8)
def _permute_fn(T: int, interpret: bool):
    """jitted pallas_call: (50, B) uint32 -> (50, B), B % T == 0.

    The 24 rounds run as an in-kernel ``fori_loop`` (the program holds ONE
    round body — a full unroll is ~8400 vector ops, which both Mosaic and
    the interpret-mode XLA emulation compile painfully slowly); the round
    constants come in as two (24, T) lane-broadcast VMEM rows read with a
    dynamic ref load per round, the same pattern as the NTT kernel's
    twiddle table."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, rc_lo_ref, rc_hi_ref, o_ref):
        def round_fn(r, st):
            lanes = [(st[2 * i], st[2 * i + 1]) for i in range(25)]
            rc_lo = rc_lo_ref[pl.dslice(r, 1)][0]  # (T,)
            rc_hi = rc_hi_ref[pl.dslice(r, 1)][0]
            lanes = _round(lanes, rc_lo, rc_hi)
            return jnp.stack([w for lane in lanes for w in lane])

        o_ref[:] = jax.lax.fori_loop(
            0, len(_k._ROUND_CONSTANTS), round_fn, x_ref[:])

    def run(flat, rc_lo, rc_hi):
        B = flat.shape[1]
        R = rc_lo.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((50, B), jnp.uint32),
            grid=(B // T,),
            in_specs=[
                pl.BlockSpec((50, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((50, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(flat, rc_lo, rc_hi)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _rc_rows(T: int):
    import numpy as np

    lo = np.array([rc & 0xFFFFFFFF for rc in _k._ROUND_CONSTANTS],
                  np.uint32)
    hi = np.array([rc >> 32 for rc in _k._ROUND_CONSTANTS], np.uint32)
    return (jnp.asarray(np.broadcast_to(lo[:, None], (lo.size, T)).copy()),
            jnp.asarray(np.broadcast_to(hi[:, None], (hi.size, T)).copy()))


@functools.lru_cache(maxsize=1)
def _probe() -> bool:
    """ONE eager compile+run of the kernel at a representative multi-tile
    shape, checked against the XLA path.  Lowering failures (or wrong
    results — a miscompiled kernel must never ship digests) disable the
    pallas route for the process.

    The probe body runs under ``jax.ensure_compile_time_eval()``: the
    first ``keccak_f`` call of a process almost always happens inside an
    outer jit trace (``keccak._jitted_sponge_words``), where every jnp op
    would otherwise become a tracer of the *outer* computation and the
    final ``bool(...)`` would raise ``TracerBoolConversionError`` — which
    the blanket except would then cache as a permanent False, silently
    disabling the kernel for the process (the round-4 dispatch bug).
    ``ensure_compile_time_eval`` makes the probe genuinely eager whatever
    the ambient trace state, so the verdict reflects the kernel, not the
    call site."""
    import numpy as np

    try:
        with jax.ensure_compile_time_eval():
            T = _tile()
            B = 2 * T
            rng = np.random.default_rng(7)
            st = jnp.asarray(rng.integers(0, 1 << 32, (25, 2, B),
                                          dtype=np.uint32))
            rc_lo, rc_hi = _rc_rows(T)
            got = _permute_fn(T, _mode() == "interpret")(
                st.reshape(50, B), rc_lo, rc_hi)
            want = _k._keccak_f_xla(st).reshape(50, B)
            return bool(jnp.array_equal(got, want))
    except Exception as e:  # noqa: BLE001 — Mosaic lowering gaps degrade
        import warnings

        warnings.warn(
            f"pallas keccak kernel unavailable ({type(e).__name__}: "
            f"{str(e)[:300]}); using the XLA path", RuntimeWarning)
        return False


def available(batch_shape) -> bool:
    """Route keccak_f here?  Cheap checks first; the probe compiles once."""
    mode = _mode()
    if mode == "off":
        return False
    import numpy as np

    n = int(np.prod(batch_shape)) if batch_shape else 1
    if mode != "interpret":
        # tiny batches: tile padding + launch overhead beat the bandwidth
        # saving; the XLA loop is fine there.  CPU has no Mosaic backend.
        if jax.default_backend() == "cpu" or n < _tile():
            return False
    return _probe()


def keccak_f(state):
    """Traced drop-in for the XLA permutation: state (25, 2, *B) uint32.
    Call only when :func:`available` returned True."""
    import numpy as np

    batch = state.shape[2:]
    B = int(np.prod(batch)) if batch else 1
    T = min(_tile(), max(128, B))
    Bp = -(-B // T) * T
    flat = state.reshape(50, B)
    if Bp != B:
        flat = jnp.pad(flat, ((0, 0), (0, Bp - B)))
    rc_lo, rc_hi = _rc_rows(T)
    out = _permute_fn(T, _mode() == "interpret")(flat, rc_lo, rc_hi)
    if Bp != B:
        out = out[:, :B]
    return out.reshape((25, 2) + batch)
