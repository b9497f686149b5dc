"""Multi-scalar multiplication.

Parity: ``msm/naive.rs:34`` and Pippenger (``msm/pippenger.rs:19``,
window auto-tune :34, parallel variant :109).

TPU-native design: the classic Pippenger inner loop is a scatter-add of
points into buckets — hostile to a vector machine.  Here each window's
bucket accumulation is reformulated as a **sort + segmented scan**:

1. sort the batch by bucket index (one u32 argsort, points gathered once),
2. segmented inclusive scan with the group law via ``associative_scan``
   (the operator carries a segment-start flag, so it remains associative),
3. gather each segment's last element = the bucket sum,
4. reduce buckets to the window value with a suffix scan (sum of suffix
   sums equals the weighted sum Σ j·B_j),
5. combine windows with c doublings per window on a single point (host
   loop, O(bits) tiny device calls).

Everything is batched digit-array math; the only data-dependent structure
(the sort) is exactly what XLA:TPU executes well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .weierstrass import JacobianOps, WeierstrassCurve

# Scalars are pure bit containers (only windows/bits are ever extracted, no
# modular arithmetic), so they always use the plain 16-bit digit layout
# regardless of the field's kernel digit width.
DIGIT_BITS = 16


def scalars_to_digits(scalar_field_or_curve, scalars):
    """Host ints -> canonical (NOT Montgomery) digit array (Ks, B)."""
    from ..ops import limbs

    curve = scalar_field_or_curve
    order = curve.order if isinstance(curve, WeierstrassCurve) else curve.p
    # scalars are reduced mod the subgroup order
    vals = [int(s) % order for s in scalars]

    class _Tmp:
        p = order
        digit_bits = DIGIT_BITS
        digit_mask = (1 << DIGIT_BITS) - 1
        num_digits = max(1, -(-order.bit_length() // DIGIT_BITS))

    return jnp.asarray(limbs.ints_to_digits_np(vals, _Tmp))


def msm_naive_host(scalars, points):
    """Exact host MSM (``msm/naive.rs:34``) — the oracle."""
    if not points:
        raise ValueError("empty MSM")
    acc = points[0].curve.neutral()
    for s, pt in zip(scalars, points):
        acc = acc.operate_with(pt.operate_with_self(int(s)))
    return acc


def msm_double_and_add(curve: WeierstrassCurve, scalar_digits, points_dev):
    """Batched double-and-add: every scalar multiplies its point in
    parallel (one ``lax.scan`` over the bits), then one log-depth tree
    reduction.  Simple, fully-parallel baseline for correctness and small
    batches."""
    ops = JacobianOps(curve)
    nbits = curve.order.bit_length() if curve.order else curve.field.params.nbits
    B = scalar_digits.shape[-1]

    def body(acc, bit_index):
        # msb-first: bit b = bits[nbits-1-i]
        b = nbits - 1 - bit_index
        digit = jax.lax.dynamic_index_in_dim(
            scalar_digits, b // DIGIT_BITS, axis=0, keepdims=False
        )
        bit = (digit >> jnp.uint32(b % DIGIT_BITS)) & jnp.uint32(1)
        acc = ops.double(acc)
        added = ops.add(acc, points_dev)
        acc = ops.select(bit == 1, added, acc)
        return acc, None

    init = ops.neutral((B,))
    acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
    return ops.tree_reduce(acc)


def optimum_window_size(n: int) -> int:
    """4 + log2(n)*4/5, the reference's auto-tune (``pippenger.rs:34``)."""
    import math

    return max(1, int(4 + 0.8 * math.log2(max(n, 2))))


def msm_pippenger(curve: WeierstrassCurve, scalar_digits, points_dev,
                  window_size: int | None = None,
                  windows_per_pass: int | None = None):
    """Bucket-method MSM over device arrays (``pippenger.rs:42`` parity).

    The per-window pipeline (sort by bucket -> segmented Hillis–Steele
    run-sums -> scatter segment totals -> suffix-scan bucket reduction)
    is VECTORISED across windows: a pass processes a (W_pass, B) block so
    every batched EC add runs at W_pass*B lane width — Pippenger's window
    loop costs lanes, not time.  Passes chunk the window axis to bound
    the gathered-points memory; windows then Horner-combine MSB-first (c
    doublings per window) in one small scan.
    """
    ops = JacobianOps(curve)
    B = scalar_digits.shape[-1]
    nbits = curve.order.bit_length() if curve.order else curve.field.params.nbits
    c = window_size or optimum_window_size(B)
    c = min(c, 15)  # window must fit strictly inside a pair of digits
    n_windows = -(-nbits // c)
    nbuckets = 1 << c
    K = points_dev[0].shape[0]

    # chunk the window axis so gathered points stay ~<= 2^25 u32 lanes
    if windows_per_pass is None:
        windows_per_pass = max(1, min(n_windows, (1 << 25) // max(3 * K * B, 1)))
    wpp = windows_per_pass
    W = -(-n_windows // wpp) * wpp  # padded to a multiple (MSB pad = zeros)

    # window id matrix (W, B), most significant window first for Horner;
    # padding windows (ids 0) contribute the neutral value
    ids = []
    for w in range(n_windows):
        start = w * c
        digit_idx = start // DIGIT_BITS
        shift = start % DIGIT_BITS
        lo = scalar_digits[digit_idx] >> jnp.uint32(shift)
        if digit_idx + 1 < scalar_digits.shape[0] and shift + c > DIGIT_BITS:
            lo = lo | (scalar_digits[digit_idx + 1]
                       << jnp.uint32(DIGIT_BITS - shift))
        ids.append(lo & jnp.uint32(nbuckets - 1))
    zeros = jnp.zeros_like(ids[0])
    ids = [zeros] * (W - n_windows) + ids[::-1]
    id_matrix = jnp.stack(ids)  # (W, B)

    def pass_values(windows):
        """(wpp, B) ids -> per-window totals, components (K, wpp, 1)."""
        order = jnp.argsort(windows, axis=-1)
        sorted_ids = jnp.take_along_axis(windows, order, axis=-1)
        pt = tuple(jnp.take(comp, order, axis=-1) for comp in points_dev)
        pt = ops.select(sorted_ids != 0, pt, ops.neutral((wpp, B)))

        boundary = (sorted_ids[:, 1:] != sorted_ids[:, :-1]).astype(jnp.uint32)
        seg_start = jnp.concatenate(
            [jnp.ones((wpp, 1), jnp.uint32), boundary], axis=-1)
        sums = ops.segmented_scan(pt, seg_start)

        seg_end = jnp.concatenate(
            [boundary.astype(bool), jnp.ones((wpp, 1), bool)], axis=-1)
        idx = jnp.where(seg_end, sorted_ids, jnp.uint32(nbuckets))
        rows = jnp.arange(wpp)[:, None]
        neutral_buckets = ops.neutral((wpp, nbuckets + 1))
        buckets = tuple(
            dst.at[:, rows, idx].set(src, mode="drop")[..., :nbuckets]
            for dst, src in zip(neutral_buckets, sums)
        )
        nz = ops.neutral((wpp, 1))
        buckets = tuple(
            comp.at[:, :, 0].set(nc[:, :, 0]) for comp, nc in zip(buckets, nz)
        )

        # sum_j j*B_j = sum of suffix sums S_1..S_{nb-1}: prefix-scan the
        # reversed buckets (dropping bucket 0) and tree-reduce
        rev = tuple(jnp.flip(comp, axis=-1)[..., :-1] for comp in buckets)
        suffix_flags = jnp.broadcast_to(
            jnp.zeros(nbuckets - 1, jnp.uint32).at[0].set(1),
            (wpp, nbuckets - 1))
        scanned = ops.segmented_scan(rev, suffix_flags)
        return ops.tree_reduce(scanned)  # (K, wpp, 1)

    chunks = [pass_values(id_matrix[i:i + wpp]) for i in range(0, W, wpp)]
    values = tuple(jnp.concatenate(cs, axis=1) for cs in zip(*chunks))
    # -> scan xs: (W, K, 1) per coordinate
    xs = tuple(jnp.swapaxes(v, 0, 1) for v in values)

    def horner_step(result, window_value):
        for _ in range(c):
            result = ops.double(result)
        return ops.add(result, window_value), None

    result, _ = jax.lax.scan(horner_step, ops.neutral((1,)), xs)
    return result


def msm(curve: WeierstrassCurve, scalars, points, window_size=None,
        method: str = "pippenger"):
    """Host-friendly entry: host scalars + host points -> host point.

    Parity with ``pippenger::msm`` (``msm/pippenger.rs:19``): auto window,
    errors on length mismatch.
    """
    if len(scalars) != len(points):
        raise ValueError("scalars and points must have the same length")
    if not points:
        return None
    # pad the instance to a power of two with zero scalars (bucket 0 is
    # dropped): MSMs of nearby sizes share one compiled program
    n = len(scalars)
    target = 1 << (n - 1).bit_length() if n > 1 else 1
    if target != n:
        scalars = list(scalars) + [0] * (target - n)
        points = list(points) + [curve.generator()] * (target - n)
    ops = JacobianOps(curve)
    pts = ops.from_host(points)
    sc = scalars_to_digits(curve, scalars)
    if method == "naive":
        out = msm_double_and_add(curve, sc, pts)
    else:
        out = msm_pippenger(curve, sc, pts, window_size)
    return ops.to_host(out)[0]
