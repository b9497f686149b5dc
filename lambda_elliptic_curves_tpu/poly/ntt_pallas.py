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

Kernel structure:

* grid over batch tiles — each program owns a ``(K, T, n)`` uint32 block
  (digit planes x batch rows x transform lanes), sized to ~1-2 MB;
* the constant-geometry (Pease) network of ``ntt._fft_pease``: because
  the network's geometry is stage-invariant, ALL post-peel stages run as
  one ``lax.fori_loop`` whose body reads stage s's twiddle row
  ``tw[l mod 2^s]`` from a precomputed ``(S-1, K, n/2)`` stage table
  (built OUTSIDE the kernel by one gather), multiplies with the lazy
  Montgomery product and interleaves add/sub halves in VMEM — the rolled
  loop keeps the kernel jaxpr O(stage body), not O(log n · body), which
  is what makes the program compilable (the unrolled form drove XLA/CPU
  interpret-mode compiles past 3 minutes at n=16);
* the digit arithmetic is the verbatim digit-list core of
  :mod:`..ops.limbs` (``mont_mul_lazy`` / ``add_raw`` / ``sub_offset_raw``
  / ``cond_sub_const``) — pure elementwise uint32 ops with statically
  checked bounds, which Mosaic lowers directly;
* bit-reverse output gather and final canonicalisation stay outside the
  kernel (they are single XLA passes).

Scope: fields with lazy-reduction headroom (``ntt._lazy_tier >= 1`` —
Stark252-class 256-bit fields); everything else falls back to the XLA
Pease path, as does CPU-only execution unless interpret mode is forced
(tests run with ``LWT_NTT_PALLAS=interpret``).
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


def _mode() -> str:
    """'on' (TPU compile), 'interpret' (forced, for CPU tests), 'off'."""
    return os.environ.get("LWT_NTT_PALLAS", "on")


def _tile_rows(K: int, n: int) -> int:
    """Batch rows per block: multiple of 8, block <= _MAX_BLOCK_BYTES."""
    t = _MAX_BLOCK_BYTES // (K * n * 4)
    return max(8, (t // 8) * 8)


@functools.lru_cache(maxsize=None)
def _stage_indices(n: int) -> np.ndarray:
    """(S-1, n/2) int32: stage s (1-based) uses twiddle ``l mod 2^s``."""
    h = n // 2
    stages = n.bit_length() - 1
    lane = np.arange(h, dtype=np.int32)
    return np.stack([lane & ((1 << s) - 1) for s in range(1, stages)])


@functools.lru_cache(maxsize=None)
def _kernel_for(field: PrimeField, n: int, T: int, interpret: bool):
    """Compiled pallas_call for one (field, n, tile) shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fp = field.params
    K = fp.num_digits
    p = fp.p
    h = n // 2
    stages = n.bit_length() - 1
    tier = ntt._lazy_tier(fp)
    assert tier >= 1
    inv = 4 * p if tier == 2 else 2 * p
    red = 2 * p
    r_cap = 1 << (fp.digit_bits * fp.num_digits)
    wb_b = (p * inv) // r_cap + p + 1
    assert wb_b <= 2 * p and p * inv < r_cap * p
    assert max(red, max(inv + wb_b, inv + 2 * p) - red) <= inv
    assert max(inv + wb_b, inv + 2 * p) < r_cap

    def interleave(sa, sb):
        # out[2i] = sa[i], out[2i+1] = sb[i] — the Pease perfect shuffle
        # applied to [sa; sb], kept in VMEM
        y = jnp.stack([sa, sb], axis=-1)  # (K, T, h, 2)
        return y.reshape(K, T, n)

    def kernel(x_ref, tw_ref, o_ref):
        y = x_ref[:]  # (K, T, n) canonical Montgomery digits
        # stage 0 peeled: twiddle == 1, canonical inputs -> values < 2p
        a, b = y[..., :h], y[..., h:]
        y = interleave(
            limbs.add_raw(a, b, fp, 2 * p),
            limbs.sub_offset_raw(a, b, p, fp, 2 * p),
        )

        def stage(s, y):
            # twiddle row for stage s: tw_ref[s-1], canonical Montgomery
            w = jax.lax.dynamic_index_in_dim(
                tw_ref[:], s - 1, axis=0, keepdims=False)[:, None, :]
            a, b = y[..., :h], y[..., h:]
            wb, _ = limbs.mont_mul_lazy(
                jnp.broadcast_to(w, (K, T, h)), b, fp, p * inv
            )
            s_add = limbs.cond_sub_const(
                limbs.add_raw(a, wb, fp, inv + wb_b), red, fp
            )
            s_sub = limbs.cond_sub_const(
                limbs.sub_offset_raw(a, wb, 2 * p, fp, inv + 2 * p), red, fp
            )
            return interleave(s_add, s_sub)

        # bound invariant: stage() maps values < inv to values < inv
        # (checked statically above), so the rolled loop is sound
        o_ref[:] = jax.lax.fori_loop(1, stages, stage, y)

    def run(x, tw_stages):
        # x: (K, B, n) with B % T == 0; tw_stages: (S-1, K, h)
        B = x.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, B, n), jnp.uint32),
            grid=(B // T,),
            in_specs=[
                pl.BlockSpec((K, T, n), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((stages - 1, K, h), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, T, n), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tw_stages)

    # jit so repeated invocations at one shape reuse the traced program
    # (the unrolled kernel body is a large jaxpr — retracing dominates
    # otherwise, especially in interpret mode)
    return jax.jit(run)


def _local_fft(x, field: PrimeField, root_int: int, canonical: bool = True):
    """Drop-in for ``ntt._fft_pease`` (same contract: natural-order input,
    natural-order spectrum out; with ``canonical=False`` returns
    ``(lazy_digits, value_bound)``)."""
    n = x.shape[-1]
    fp = field.params
    mode = _mode()
    usable = (
        mode != "off"
        and n >= _MIN_N
        and ntt._lazy_tier(fp) >= 1
        and fp.num_digits * 8 * n * 4 <= 2 * _MAX_BLOCK_BYTES
        and (mode == "interpret" or jax.default_backend() != "cpu")
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
    h = n // 2
    tw_br = ntt._local_twiddles(field, root_int, n)  # (K, h)
    idx = jnp.asarray(_stage_indices(n).reshape(-1))
    tw_stages = jnp.take(tw_br, idx, axis=-1).reshape(K, stages - 1, h)
    tw_stages = jnp.swapaxes(tw_stages, 0, 1)  # (S-1, K, h)

    run = _kernel_for(field, n, T, mode == "interpret")
    y = run(xb, tw_stages)

    if Bp != B:
        y = y[:, :B]
    y = y.reshape((K,) + batch + (n,))
    y = ntt.bit_reverse_permute(y)
    tier = ntt._lazy_tier(fp)
    bound = 4 * fp.p if tier == 2 else 2 * fp.p
    if canonical:
        return ntt._canonicalize(y, bound, fp)
    return y, bound


# ---------------------------------------------------------------------------
# public API mirroring ntt.fft / ntt.ifft (used by bench.py as the "pallas"
# implementation; the four-step split above the local hook is shared)
# ---------------------------------------------------------------------------

def fft_with_root(x, field: PrimeField, root_int: int, canonical: bool = True):
    return ntt.fft_with_root(x, field, root_int, canonical,
                             local_fn=_local_fft)


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
