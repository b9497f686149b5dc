"""Pallas-TPU NTT: VMEM-resident multi-stage butterfly kernel.

The Pease/four-step NTT (:mod:`.ntt`) executes one HBM round trip per
butterfly stage — the measured floor on this hardware is ~5.5 ms of pure
data movement per stage at 2^22 (ROADMAP).  This module is the Pallas
answer (parity role: the reference's GPU butterfly kernels,
``math/src/gpu/metal/shaders/fft.h.metal:1``, ``fft/cpu/fft.rs:20``): one
kernel runs ALL ``log2(n)`` stages of a local transform on a block held in
VMEM, so an n-point local transform costs exactly one HBM read and one HBM
write regardless of stage count.  Plugged into the four-step decomposition
(``ntt.fft_with_root(local_fn=...)``), a 2^22 transform drops from ~22
shuffled HBM passes to ~2 local-transform passes plus the transposes and
the cross-twiddle multiply.

Kernel structure (this is the SECOND formulation; see history below):

* grid over batch tiles — each program owns a ``(K, T, n)`` uint32 block
  (digit planes x batch rows x transform lanes), sized to ~1-2 MB;
* an **in-place Gentleman–Sande (DIF) network**: stage ``s`` pairs lanes
  at distance ``d = n >> (s+1)`` via two ``pltpu.roll``s (dynamic lane
  rotates — the only data movement Mosaic lowers natively for this
  access pattern) and a ``(lane & d) == 0`` mask select; natural-order
  input, bit-reversed output (the final gather runs outside the kernel).
  All multiply stages run as one ``lax.fori_loop`` reading stage ``s``'s
  twiddle row from a precomputed ``(S-1, K, n)`` table via a dynamic ref
  load; the last stage (twiddle == 1) is peeled to a plain add/sub.
* the digit arithmetic is the verbatim digit-list core of
  :mod:`..ops.limbs` (``mont_mul_lazy`` / ``add_raw`` / ``sub_offset_raw``
  / ``cond_sub_const``) — pure elementwise uint32 ops with statically
  checked bounds, which Mosaic lowers directly.  Lazy-bound invariant:
  values stay < 2p across stages (sum takes one conditional subtract; the
  lazy Montgomery product of a canonical twiddle with a < 4p operand is
  < 2p by the tier-1 headroom check), and the peeled final stage emits
  < 4p, canonicalised outside.

Why not the constant-geometry (Pease) network of ``ntt._fft_pease``: its
per-stage perfect shuffle is a minor-dim interleave — a
``(..., n/2, 2) -> (..., n)`` reshape that Mosaic rejects on real TPU
toolchains (``tpu.reshape`` of ``vector<...x2048x2xi32>`` to
``vector<...x4096xi32>`` fails to lower), and there is no native
element-interleave op (``pltpu.repeat`` is tile-style concatenation).
The in-place DIF network trades the shuffle for two dynamic lane rotates
per stage and one full-width (vs half-width) Montgomery multiply — both
VMEM-resident, so the HBM math above still holds.

Scope: fields with lazy-reduction headroom (``ntt._lazy_tier >= 1`` —
Stark252-class 256-bit fields); everything else falls back to the XLA
Pease path, as does CPU-only execution unless interpret mode is forced
(tests run with ``LWT_NTT_PALLAS=interpret``).  Any Mosaic lowering
failure at runtime also degrades to the XLA path (never fatal).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.field import PrimeField
from ..ops import limbs
from . import ntt

# largest local transform the kernel accepts; the four-step recursion above
# splits anything bigger before it reaches the local hook
_MAX_BLOCK_BYTES = 1 << 21  # target VMEM per input block (~2 MB)
_MIN_N = 256                # below this the XLA path wins (gather + pad cost)
# validated-on-silicon ceiling: n in {256..1024} lowers and runs on the v5e
# remote compiler; n >= 2048 crashes the tpu_compile_helper (HTTP 500, no
# diagnostics emitted).  Sizes above the cap fall back to the XLA path
# rather than paying a known-failing compile.
_MAX_N = int(os.environ.get("LWT_NTT_PALLAS_MAX_N", "1024"))


def _mode() -> str:
    """'on' (TPU compile), 'interpret' (forced, for CPU tests), 'off'."""
    return os.environ.get("LWT_NTT_PALLAS", "on")


# (field, n, T) combos whose kernel failed to lower on this backend; they
# skip straight to the XLA path on subsequent calls
_BROKEN: set = set()


def _tile_rows(K: int, n: int) -> int:
    """Batch rows per block: multiple of 8, block <= _MAX_BLOCK_BYTES."""
    t = _MAX_BLOCK_BYTES // (K * n * 4)
    return max(8, (t // 8) * 8)


@functools.lru_cache(maxsize=None)
def _dif_stage_indices(n: int) -> np.ndarray:
    """(S-1, n) int32 twiddle-power index per DIF stage: stage ``s`` pairs
    lanes at distance ``d = n >> (s+1)`` and multiplies the difference by
    ``root^((j & (d-1)) << s)`` (identical at both pair positions).  The
    last stage (s = S-1, d = 1) has twiddle 1 and is peeled."""
    stages = n.bit_length() - 1
    j = np.arange(n, dtype=np.int64)
    rows = []
    for s in range(stages - 1):
        d = n >> (s + 1)
        rows.append(((j & (d - 1)) << s).astype(np.int32))
    return np.stack(rows) if rows else np.zeros((0, n), np.int32)


@functools.lru_cache(maxsize=None)
def _kernel_for(field: PrimeField, n: int, T: int, interpret: bool):
    """Compiled pallas_call for one (field, n, tile) shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fp = field.params
    K = fp.num_digits
    p = fp.p
    stages = n.bit_length() - 1
    tier = ntt._lazy_tier(fp)
    assert tier >= 1
    r_cap = 1 << (fp.digit_bits * fp.num_digits)
    # invariant: stage inputs < 2p.  sum < 4p -> cond_sub(2p) -> < 2p;
    # diff (a - b + 2p) < 4p; lazy product of canonical twiddle (< p) with
    # diff needs p*4p < R*p and emits < 4p^2/R + p + 1 <= 2p since R > 4p
    assert 4 * p < r_cap
    wd_bound = (p * 4 * p) // r_cap + p + 1
    assert wd_bound <= 2 * p

    def kernel(x_ref, tw_ref, o_ref):
        y = x_ref[:]  # (K, T, n) canonical Montgomery digits (< p < 2p)
        lane = jax.lax.broadcasted_iota(jnp.int32, (K, T, n), 2)

        def butterfly(y, d):
            """One DIF stage at (dynamic) distance d: returns the masked
            sum/diff halves (sum at bit-clear lanes, diff at bit-set)."""
            mask = (lane & d) == 0
            # partner[j] = y[j + d] at bit-clear lanes, y[j - d] at bit-set
            right = pltpu.roll(y, d, axis=2)            # y[j - d]
            left = pltpu.roll(y, jnp.int32(n) - d, axis=2)  # y[j + d]
            partner = jnp.where(mask, left, right)
            s_sum = limbs.add_raw(y, partner, fp, 4 * p)
            s_diff = limbs.sub_offset_raw(partner, y, 2 * p, fp, 4 * p)
            return mask, s_sum, s_diff

        def stage(s, y):
            d = jnp.int32(n) >> (s + jnp.int32(1))
            mask, s_sum, s_diff = butterfly(y, d)
            s_sum = limbs.cond_sub_const(s_sum, 2 * p, fp)
            # twiddle row for stage s, canonical Montgomery — a dynamic
            # ref load (Mosaic lowers these; dynamic_slice on a
            # materialized value it does not)
            w = tw_ref[pl.dslice(s, 1)][0][:, None, :]
            wd, _ = limbs.mont_mul_lazy(
                jnp.broadcast_to(w, (K, T, n)), s_diff, fp, p * 4 * p)
            return jnp.where(mask, s_sum, wd)

        y = jax.lax.fori_loop(0, stages - 1, stage, y)
        # peeled final stage: d = 1, twiddle 1 — plain add/sub, bound 4p
        mask, s_sum, s_diff = butterfly(y, jnp.int32(1))
        o_ref[:] = jnp.where(mask, s_sum, s_diff)

    def run(x, tw_stages):
        # x: (K, B, n) with B % T == 0; tw_stages: (S-1, K, n)
        B = x.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, B, n), jnp.uint32),
            grid=(B // T,),
            in_specs=[
                pl.BlockSpec((K, T, n), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((stages - 1, K, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, T, n), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tw_stages)

    # jit so repeated invocations at one shape reuse the traced program
    return jax.jit(run)


def _local_fft(x, field: PrimeField, root_int: int, canonical: bool = True):
    """Drop-in for ``ntt._fft_pease`` (same contract: natural-order input,
    natural-order spectrum out; with ``canonical=False`` returns
    ``(lazy_digits, value_bound)``).

    Locals larger than the silicon-validated ``_MAX_N`` do not fall back to
    XLA: they re-enter the four-step recursion with an *unbalanced* split
    (``max_local=_MAX_N``), so the bulk transform legs stay 1024-point VMEM
    kernels and only the short n1 legs (< ``_MIN_N``) run on the XLA path."""
    n = x.shape[-1]
    fp = field.params
    mode = _mode()
    common_ok = (
        mode != "off"
        and (field.name, n) not in {(f, m) for f, m, _ in _BROKEN}
        and ntt._lazy_tier(fp) >= 1
        and (mode == "interpret" or jax.default_backend() != "cpu")
    )
    if common_ok and n > _MAX_N and mode != "interpret":
        return ntt.fft_with_root(x, field, root_int, canonical,
                                 local_fn=_local_fft, max_local=_MAX_N)
    usable = (
        common_ok
        and n >= _MIN_N
        and (n <= _MAX_N or mode == "interpret")
        and fp.num_digits * 8 * n * 4 <= 2 * _MAX_BLOCK_BYTES
    )
    if not usable:
        return ntt._fft_pease(x, field, root_int, canonical)

    K = x.shape[0]
    batch = x.shape[1:-1]
    B = int(np.prod(batch)) if batch else 1
    # tile rows: VMEM-bounded, but never padded past the batch itself
    T = min(_tile_rows(K, n), max(8, -(-B // 8) * 8))
    Bp = -(-B // T) * T
    xb = x.reshape(K, B, n)
    if Bp != B:
        xb = jnp.pad(xb, ((0, 0), (0, Bp - B), (0, 0)))

    stages = n.bit_length() - 1
    # natural-order twiddle powers root^0..root^(n/2-1), gathered into the
    # per-stage (S-1, K, n) DIF tables
    pows = ntt.powers(field, root_int, max(n // 2, 1))  # (K, n/2)
    idx = jnp.asarray(_dif_stage_indices(n).reshape(-1))
    tw_stages = jnp.take(pows, idx, axis=-1).reshape(K, stages - 1, n)
    tw_stages = jnp.swapaxes(tw_stages, 0, 1)  # (S-1, K, n)

    run = _kernel_for(field, n, T, mode == "interpret")
    try:
        y = run(xb, tw_stages)
    except Exception as e:  # noqa: BLE001 — Mosaic lowering gaps are
        # backend-version-specific; a lowering failure must degrade to the
        # XLA Pease path, never kill a prover or bench run
        _BROKEN.add((field.name, n, T))
        import warnings

        warnings.warn(
            f"pallas NTT kernel failed to lower ({type(e).__name__}: "
            f"{str(e)[:400]}); falling back to the XLA Pease path",
            RuntimeWarning)
        return ntt._fft_pease(x, field, root_int, canonical)

    if Bp != B:
        y = y[:, :B]
    y = y.reshape((K,) + batch + (n,))
    y = ntt.bit_reverse_permute(y)
    bound = 4 * fp.p
    if canonical:
        return ntt._canonicalize(y, bound, fp)
    return y, bound


# ---------------------------------------------------------------------------
# public API mirroring ntt.fft / ntt.ifft (used by bench.py as the "pallas"
# implementation; the four-step split above the local hook is shared)
# ---------------------------------------------------------------------------

def fft_with_root(x, field: PrimeField, root_int: int, canonical: bool = True):
    # On real TPU with a kernel-capable field, pin locals to _MAX_N from the
    # top (one fewer split level than letting _local_fft re-split each
    # balanced sqrt(n) leg).
    use_max = (
        _mode() == "on"
        and jax.default_backend() != "cpu"
        and ntt._lazy_tier(field.params) >= 1
    )
    return ntt.fft_with_root(x, field, root_int, canonical,
                             local_fn=_local_fft,
                             max_local=_MAX_N if use_max else None)


def fft(coeffs, field: PrimeField):
    n = coeffs.shape[-1]
    ntt._check_pow2(n)
    order = n.bit_length() - 1
    if order > field.two_adicity:
        raise ntt.FFTError(
            f"{field.name}: order {order} exceeds two-adicity "
            f"{field.two_adicity}"
        )
    return fft_with_root(coeffs, field,
                         field.params.primitive_root_of_unity(order))


def ifft(evals, field: PrimeField):
    n = evals.shape[-1]
    ntt._check_pow2(n)
    order = n.bit_length() - 1
    if order > field.two_adicity:
        raise ntt.FFTError(
            f"{field.name}: order {order} exceeds two-adicity "
            f"{field.two_adicity}"
        )
    root = field.params.primitive_root_of_unity(order)
    out, _bound = fft_with_root(
        evals, field, pow(root, field.p - 2, field.p), canonical=False
    )
    n_inv = field.constant(pow(n, field.p - 2, field.p), ())
    n_inv = n_inv.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return field.mul(out, jnp.broadcast_to(n_inv, out.shape))
