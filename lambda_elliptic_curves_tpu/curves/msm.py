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
import os

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
    order = getattr(curve, "order", 0) or curve.p
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


def _make_ops(curve):
    """Group-law ops for a curve: G1 ``JacobianOps`` unless the curve
    declares its own (e.g. :class:`..curves.twists.TwistCurve` -> G2)."""
    return getattr(curve, "jacobian_ops_class", JacobianOps)(curve)


def _scalar_bits(curve) -> int:
    order = getattr(curve, "order", 0)
    return order.bit_length() if order else curve.field.params.nbits


def msm_double_and_add(curve, scalar_digits, points_dev, ops=None):
    """Batched double-and-add: every scalar multiplies its point in
    parallel (one ``lax.scan`` over the bits), then one log-depth tree
    reduction.  Simple, fully-parallel baseline for correctness and small
    batches."""
    ops = ops or _make_ops(curve)
    nbits = _scalar_bits(curve)
    B = scalar_digits.shape[-1]

    def body(acc, bit_index):
        # msb-first: bit b = bits[nbits-1-i]
        b = nbits - 1 - bit_index
        digit = jax.lax.dynamic_index_in_dim(
            scalar_digits, b // DIGIT_BITS, axis=0, keepdims=False
        )
        bit = (digit >> jnp.uint32(b % DIGIT_BITS)) & jnp.uint32(1)
        acc = ops.double(acc)
        # points_dev comes from from_host: affine-or-infinity, so the
        # cheaper mixed add applies
        added = ops.add_mixed(acc, points_dev)
        acc = ops.select(bit == 1, added, acc)
        return acc, None

    init = ops.neutral((B,))
    acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
    return ops.tree_reduce(acc)


def bucket_accumulate_chunked(ops, sorted_ids, pt, nbuckets: int, rows: int):
    """Sorted (W, B) ids + points -> (K, W, nbuckets+1) bucket totals
    (slot ``nbuckets`` is the dump slot for invalid records).

    The sorted batch is viewed as (C columns) x (``rows`` rows); a serial
    scan over the rows costs one C-wide group add per row — ~1 add per
    point in total — instead of the log2(B) full-width adds of a
    Hillis–Steele segmented scan.

    Phase A: the scan; a column accumulates its run of equal ids, emitting
    a *flush record* (the completed segment's total) at each id change.
    Interior flushes are complete bucket sums.  The first segment and the
    last (running) segment of each column may continue across column
    boundaries.

    Phase B: a short segmented scan over the C columns chains the
    last-segment partials A_j of consecutive columns that belong to one
    bucket (links pass only through boundary-free columns), completing
    exactly one record per bucket:
      * interior flushes                          (complete in phase A)
      * first-flush of a column   F_j + chained prefix P_{j-1}
      * chain-end totals P_j wherever the next column doesn't continue
    All completed records target distinct buckets, so assembling them is a
    scatter-set, never a scatter-add.

    ``ops`` provides the group law surface (neutral/add/select/
    segmented_scan/shift_down over component tuples) — JacobianOps for EC
    points; any associative op with those methods works (the tests drive
    it with plain integer sums).
    """
    W, B = sorted_ids.shape
    K = pt[0].shape[0]
    L = rows
    C = B // L
    # element i = j*L + t  ->  column j, row t
    ids_v = sorted_ids.reshape(W, C, L)
    pt_v = tuple(comp.reshape(K, W, C, L) for comp in pt)

    first_id = ids_v[..., 0]  # (W, C)

    init_acc = tuple(comp[..., 0] for comp in pt_v)  # (K, W, C)
    init = (init_acc, first_id, jnp.zeros((W, C), jnp.uint32))

    # the inner loop adds one INPUT point per row; inputs are always
    # affine-or-infinity (from_host or a neutral fill), so EC ops take the
    # cheaper mixed-addition path (integer test ops fall back to add)
    add_input = getattr(ops, "add_mixed", None) or ops.add

    def body(carry, t):
        acc, acc_id, seen = carry
        cur_id = jnp.take(ids_v, t, axis=-1)
        cur_pt = tuple(jnp.take(comp, t, axis=-1) for comp in pt_v)
        same = cur_id == acc_id
        flush_valid = ~same
        is_first = flush_valid & (seen == 0)
        flush_pt = ops.select(flush_valid, acc, ops.neutral((W, C)))
        new_acc = ops.select(same, add_input(acc, cur_pt), cur_pt)
        new_seen = seen | flush_valid.astype(jnp.uint32)
        ys = (flush_pt, acc_id, flush_valid, is_first)
        return (new_acc, cur_id, new_seen), ys

    (acc, last_id, seen), ys = jax.lax.scan(body, init, jnp.arange(1, L))
    flush_pt, flush_id, flush_valid, flush_first = ys
    # flush_pt: tuple of (L-1, K, W, C); ids/flags: (L-1, W, C)

    # ---- phase B: chain last-segment partials across columns ----
    has_bnd = seen == 1
    prev_last = jnp.concatenate([last_id[:, :1], last_id[:, :-1]], axis=-1)
    cont = jnp.concatenate(
        [jnp.zeros((W, 1), bool), (prev_last == first_id)[:, 1:]],
        axis=-1)  # c_j: column j's first segment continues column j-1's last
    link = cont & ~has_bnd
    P = ops.segmented_scan(acc, (~link).astype(jnp.uint32))
    P_prev = ops.shift_down(P, 1)

    # F_j = the first flush of column j (sparse over the L axis)
    F = ops.neutral((W, C))
    F_taken = jnp.zeros((W, C), bool)
    for t in range(L - 1):
        take = flush_first[t] & ~F_taken
        F = ops.select(take, tuple(comp[t] for comp in flush_pt), F)
        F_taken = F_taken | take
    prefix = ops.select(cont, P_prev, ops.neutral((W, C)))
    first_total = ops.add(F, prefix)

    rows_w = jnp.arange(W)[:, None]
    dump = jnp.uint32(nbuckets)
    buckets = ops.neutral((W, nbuckets + 1))

    # (a) interior flushes (complete): scatter-set
    int_valid = flush_valid & ~flush_first  # (L-1, W, C)
    int_ids = jnp.where(int_valid, flush_id, dump)
    int_ids_f = jnp.swapaxes(int_ids, 0, 1).reshape(W, -1)
    flush_major = tuple(
        jnp.moveaxis(comp, 0, 2).reshape(comp.shape[1], W, -1)
        for comp in flush_pt
    )
    buckets = tuple(
        dst.at[:, rows_w, int_ids_f].set(src, mode="drop")
        for dst, src in zip(buckets, flush_major)
    )

    # (b) first-flush completions at columns with a boundary
    fid = jnp.where(has_bnd, first_id, dump)
    buckets = tuple(
        dst.at[:, rows_w, fid].set(src, mode="drop")
        for dst, src in zip(buckets, first_total)
    )

    # (c) chain-end totals: wherever the NEXT column does not continue the
    # running bucket (or at the array end), the chain sum P_j completes
    # bucket last_id_j
    next_cont = jnp.concatenate(
        [cont[:, 1:], jnp.zeros((W, 1), bool)], axis=-1)
    end_ids = jnp.where(~next_cont, last_id, dump)
    buckets = tuple(
        dst.at[:, rows_w, end_ids].set(src, mode="drop")
        for dst, src in zip(buckets, P)
    )
    return buckets


def optimum_window_size(n: int) -> int:
    """4 + log2(n)*4/5, the reference's auto-tune (``pippenger.rs:34``)."""
    import math

    return max(1, int(4 + 0.8 * math.log2(max(n, 2))))


# (curve, ops type, wpp, B, K, nbuckets, L) -> jitted pipeline stages
_stage_cache: dict = {}


def msm_pippenger(curve, scalar_digits, points_dev,
                  window_size: int | None = None,
                  windows_per_pass: int | None = None,
                  bucket_rows: int | None = None,
                  ops=None):
    """Bucket-method MSM over device arrays (``pippenger.rs:42`` parity).

    The per-window pipeline (sort by bucket -> segmented Hillis–Steele
    run-sums -> scatter segment totals -> suffix-scan bucket reduction)
    is VECTORISED across windows: a pass processes a (W_pass, B) block so
    every batched EC add runs at W_pass*B lane width — Pippenger's window
    loop costs lanes, not time.  Passes chunk the window axis to bound
    the gathered-points memory; windows then Horner-combine MSB-first (c
    doublings per window) in one small scan.
    """
    ops = ops or _make_ops(curve)
    B = scalar_digits.shape[-1]
    nbits = _scalar_bits(curve)
    c = window_size or optimum_window_size(B)
    c = min(c, 15)  # window must fit strictly inside a pair of digits
    n_windows = -(-nbits // c)
    nbuckets = 1 << c
    K = points_dev[0].shape[0]

    # chunk the window axis so gathered points stay ~<= 2^27 u32 lanes
    # (512 MB — a third of v5e HBM; fewer chunks = fewer dispatches, and
    # with staged compilation each extra window is batch width, not ops)
    if windows_per_pass is None:
        windows_per_pass = max(1, min(n_windows, (1 << 27) // max(3 * K * B, 1)))
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

    # bucket-accumulation chunking: the sorted batch is viewed as
    # (C columns) x (L rows); a serial lax.scan over the L rows costs one
    # (C-wide) EC add per row — ~1 add per point in total — instead of the
    # log2(B) full-width adds of a Hillis–Steele segmented scan.  L is
    # chosen so the column width C = B/L still saturates the vector lanes.
    if bucket_rows is not None:
        L_ROWS = bucket_rows
    else:
        L_ROWS = max(1, min(64, B // (1 << 13)))
    if B % max(L_ROWS, 1):
        L_ROWS = 1

    # STAGED compilation: the fused per-chunk pipeline is a compile bomb
    # on XLA:TPU — every EC add unrolls to ~40k HLO ops (K^2 digit
    # products per Montgomery multiply), and whole-program compile time
    # grows superlinearly in module size: the pieces compile in ~60 s
    # each but the monolith did not finish in 30 minutes on a v5e
    # (measured 2026-08-20; the compact stacked core is no alternative
    # at this width — its materialized (K,2K,wpp,nbuckets) product
    # tensors exceed HBM).  Splitting the chunk pipeline at its natural
    # HBM-sized boundaries makes compile cost additive and each piece
    # persistently cacheable; the extra inter-stage HBM round trips are
    # noise next to the bucket scan itself.  Inside an outer trace the
    # split is invisible (inner jits inline), so `jit(msm_pippenger)`
    # still yields one program when a caller insists.
    def sort_select(windows, points):
        order = jnp.argsort(windows, axis=-1)
        sorted_ids = jnp.take_along_axis(windows, order, axis=-1)
        pt = tuple(jnp.take(comp, order, axis=-1) for comp in points)
        pt = ops.select(sorted_ids != 0, pt, ops.neutral((wpp, B)))
        return sorted_ids, pt

    def accumulate(sorted_ids, pt):
        if L_ROWS > 1:
            buckets = bucket_accumulate_chunked(
                ops, sorted_ids, pt, nbuckets, L_ROWS)
        else:
            boundary = (sorted_ids[:, 1:]
                        != sorted_ids[:, :-1]).astype(jnp.uint32)
            seg_start = jnp.concatenate(
                [jnp.ones((wpp, 1), jnp.uint32), boundary], axis=-1)
            sums = ops.segmented_scan(pt, seg_start)
            seg_end = jnp.concatenate(
                [boundary.astype(bool), jnp.ones((wpp, 1), bool)], axis=-1)
            idx = jnp.where(seg_end, sorted_ids, jnp.uint32(nbuckets))
            rows = jnp.arange(wpp)[:, None]
            neutral_buckets = ops.neutral((wpp, nbuckets + 1))
            buckets = tuple(
                dst.at[:, rows, idx].set(src, mode="drop")
                for dst, src in zip(neutral_buckets, sums)
            )
        buckets = tuple(comp[..., :nbuckets] for comp in buckets)
        nz = ops.neutral((wpp, 1))
        return tuple(
            comp.at[:, :, 0].set(nc[:, :, 0])
            for comp, nc in zip(buckets, nz)
        )

    def _weighted_sum(vals, n, batch):
        # sum_j j*V_j = sum of suffix sums S_1..S_{n-1}: prefix-scan the
        # reversed values (dropping slot 0) and tree-reduce
        if n <= 1:
            return ops.neutral(batch + (1,))
        rev = tuple(jnp.flip(comp, axis=-1)[..., :-1] for comp in vals)
        flags = jnp.broadcast_to(
            jnp.zeros(n - 1, jnp.uint32).at[0].set(1), batch + (n - 1,))
        return ops.tree_reduce(ops.segmented_scan(rev, flags))

    def window_reduce(buckets):
        # sum_j j*B_j.  The one-level suffix-scan identity costs
        # ~log2(nb) full-width EC adds per bucket (Hillis-Steele); at
        # nb = 2^15 that dominated the whole MSM (measured 2026-08-20:
        # ~1/4 of a 137 s 2^18 run).  Two-level decomposition instead:
        # on an (R, C2) grid with j = r*C2 + t,
        #   sum_j j*B_j = C2 * sum_r r*Row_r + sum_t t*Col_t,
        # where Row_r / Col_t are plain axis sums computed by ONE serial
        # lax.scan each (~1 add per bucket, program body = one add) and
        # the two weighted subproblems are sqrt(nb)-sized.
        # two-level only where its runtime win applies (accelerators, big
        # windows); it traces ~6 more group-law bodies than one-level,
        # which the CPU rig compiles painfully at digit-core widths.
        # LWT_MSM_REDUCE=two_level|one_level overrides (tests force
        # two_level at compact-core widths for differential coverage).
        reduce_mode = os.environ.get("LWT_MSM_REDUCE", "auto")
        two_level = reduce_mode == "two_level" or (
            reduce_mode == "auto" and nbuckets >= 4096
            and jax.default_backend() != "cpu")
        if not two_level:
            vals = tuple(comp for comp in buckets)
            return _weighted_sum(vals, nbuckets, (wpp,))
        R = 1 << (c // 2)
        C2 = nbuckets // R
        grid = tuple(comp.reshape(comp.shape[0], wpp, R, C2)
                     for comp in buckets)

        def add_step(acc, x):
            return ops.add(acc, x), None

        # Row_r = sum_t B_{r,t}: scan over the C2 (minor) axis
        xs_t = tuple(jnp.moveaxis(comp, -1, 0) for comp in grid)
        rows, _ = jax.lax.scan(add_step, ops.neutral((wpp, R)), xs_t)
        # Col_t = sum_r B_{r,t}: scan over the R axis
        xs_r = tuple(jnp.moveaxis(comp, -2, 0) for comp in grid)
        cols, _ = jax.lax.scan(add_step, ops.neutral((wpp, C2)), xs_r)

        wr = _weighted_sum(rows, R, (wpp,))   # sum_r r*Row_r
        wc = _weighted_sum(cols, C2, (wpp,))  # sum_t t*Col_t
        for _ in range(C2.bit_length() - 1):  # * C2 (a power of two)
            wr = ops.double(wr)
        return ops.add(wr, wc)  # (K, wpp, 1)

    def horner(xs):
        # MSB-first window combine: c doublings then add, one lax.scan
        def horner_step(result, window_value):
            for _ in range(c):
                result = ops.double(result)
            return ops.add(result, window_value), None

        result, _ = jax.lax.scan(horner_step, ops.neutral((1,)), xs)
        return result

    # jit wrappers are cached per configuration so repeated same-shape
    # MSMs (KZG commits, Groth16 proves) re-trace nothing.  The horner
    # combine MUST be cached too: its scan body unrolls c+1 group ops
    # (each ~40k HLO at 256-bit digit widths), and an eager lax.scan with
    # a fresh closure re-TRACES that body every call — measured 26.8 s of
    # pure tracing per 2^18 MSM on an otherwise 5 ms pipeline (the r4
    # "catastrophically slow MSM" was this, not device math).
    stage_key = (getattr(curve, "name", id(curve)), type(ops).__name__,
                 wpp, B, K, nbuckets, L_ROWS,
                 os.environ.get("LWT_MSM_REDUCE", "auto"))
    stages = _stage_cache.get(stage_key)
    if stages is None:
        stages = _stage_cache[stage_key] = [
            jax.jit(sort_select), jax.jit(accumulate),
            jax.jit(window_reduce), jax.jit(horner)]

    def pass_values(windows, points):
        sorted_ids, pt = stages[0](windows, points)
        return stages[2](stages[1](sorted_ids, pt))

    chunks = [pass_values(id_matrix[i:i + wpp], points_dev)
              for i in range(0, W, wpp)]
    values = tuple(jnp.concatenate(cs, axis=1) for cs in zip(*chunks))
    # -> scan xs: (W, K, 1) per coordinate
    xs = tuple(jnp.swapaxes(v, 0, 1) for v in values)
    return stages[3](xs)


def msm(curve, scalars, points, window_size=None,
        method: str = "pippenger"):
    """Host-friendly entry: host scalars + host points -> host point.

    Parity with ``pippenger::msm`` (``msm/pippenger.rs:19``): auto window,
    errors on length mismatch.  Works for G1 (``WeierstrassCurve``) and G2
    (``TwistCurve``) alike — the group law is generic over the ops surface.
    """
    if len(scalars) != len(points):
        raise ValueError("scalars and points must have the same length")
    if not points:
        return None
    n = len(scalars)
    # tiny instances run on the host: a B-term host double-and-add is
    # milliseconds, while ANY device route pays whole-program compiles
    # (measured: the 13-point KZG commits of the quick-gate Plonk test
    # spent 137 s in device MSM dispatch+compile on a cold 1-core box).
    # The device pipelines are exercised by the large-B paths and their
    # dedicated tests; LWT_MSM_HOST_MAX=0 forces every size to device.
    host_max = int(os.environ.get("LWT_MSM_HOST_MAX", "64"))
    if n <= host_max:
        sc = [int(s) for s in scalars]
        if not isinstance(curve, WeierstrassCurve):  # G2 / twist points
            from .twists import msm_g2_naive_host

            return msm_g2_naive_host(sc, points)
        return msm_naive_host(sc, points)
    # pad the instance to a power of two with zero scalars (bucket 0 is
    # dropped): MSMs of nearby sizes share one compiled program
    target = 1 << (n - 1).bit_length() if n > 1 else 1
    if target != n:
        scalars = list(scalars) + [0] * (target - n)
        points = list(points) + [curve.generator()] * (target - n)
    ops = _make_ops(curve)
    pts = ops.from_host(points)
    sc = scalars_to_digits(curve, scalars)
    if method == "naive":
        out = msm_double_and_add(curve, sc, pts, ops=ops)
    else:
        out = msm_pippenger(curve, sc, pts, window_size, ops=ops)
    return ops.to_host(out)[0]
