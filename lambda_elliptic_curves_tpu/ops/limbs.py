"""Batched multi-precision field arithmetic on digit planes.

TPU-native replacement for lambdaworks' ``UnsignedInteger`` / Montgomery
CIOS core (``math/src/unsigned_integer/element.rs:35``,
``math/src/unsigned_integer/montgomery.rs:12``).  The design is dictated by
TPU hardware: no 64-bit integers and no widening multiply, but ``uint32``
lane multiplies are exact when the operands' widths sum to <= 32 bits.  An
element of F_p is a little-endian vector of K ``fp.digit_bits``-wide digits
in ``uint32`` lanes; a batch is a ``(K, *batch)`` digit-major array whose
planes are contiguous batch vectors (perfect 8x128 VPU tiling).

Digit width is a per-field parameter (``FieldParams.digit_bits``):

* **16-bit digits** (small fields): fewest planes, but every 16x16 product
  is 32 bits and must be split into lo/hi halves before the column sums.
* **13-bit digits** (large fields, the default for >= 128 bits): raw 26-bit
  products accumulate directly — column sums of up to 2K products stay
  exact in uint32 — eliminating the per-product mask/shift/extra-add.  A
  256-bit Montgomery multiply drops from ~1600 to ~1050 vector ops even
  though the digit count rises 16 -> 20.

Unlike a CPU bignum (digit-serial loops), every primitive here is built
from *lane-parallel* vector ops so that XLA emits a handful of large fused
loops and zero sequential digit chains:

* the digit axis is unrolled at trace time into plain elementwise ops over
  the batch planes (slices of the stacked array) — no pads, reshapes or
  concatenations survive in the hot path, so XLA fuses a whole Montgomery
  multiply into a few kLoop fusions with O(batch) live memory;
* products: schoolbook column sums with products shared between columns
  (and across the i/j symmetry when squaring);
* Montgomery reduction: carry-save CIOS digit recurrence for sparse moduli,
  SOS (q = T*(-p^-1) mod R as a second convolution, then T + q*p) for dense
  ones;
* carries/borrows: Kogge–Stone carry-lookahead over the digit axis,
  unrolled (log2 K rounds of bitwise ops).

Zero digits of the modulus are exploited statically: the q*p convolution
walks only p's nonzero digits, which makes sparse moduli (Stark252,
Goldilocks) much cheaper — the TPU analogue of the reference's spare-bit
CIOS optimisation.  Modulus digits enter as scalar constants, never
materialised as arrays.

Every accumulation carries a *static Python-int bound* threaded through the
helpers; a bound that could reach 2^32 raises at trace time, so overflow is
impossible by construction rather than by audit.

Everything is pure jnp: it runs identically on CPU (tests) and TPU, and the
same routines are reused verbatim inside Pallas kernel bodies.
"""

from __future__ import annotations

import functools
import math as _math

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.params import FieldParams

# numpy scalars, NOT jnp: np.uint32 operands inline as literals in traced
# code, while module-level jnp scalars become captured device constants —
# which Pallas kernel tracing rejects ("captures constants ... pass them
# as inputs").  Semantics with jax uint32 arrays are identical.
U32 = np.uint32
ONE = np.uint32(1)
_U32_MAX = (1 << 32) - 1


def _checked(bound: int) -> int:
    if bound > _U32_MAX:
        raise OverflowError(
            f"digit-kernel column bound {bound} exceeds uint32"
        )
    return bound


def _carry_digits(col_bound: int, bits: int) -> int:
    """Digits needed to hold the carry out of a column-sum half whose
    per-column bound is ``col_bound``: the carry is < (col_bound >> bits)
    + 2 after geometric accumulation across the half."""
    carry_bound = (col_bound >> bits) + 2
    return max(1, -(-carry_bound.bit_length() // bits))


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def ints_to_digits_np(values, fp: FieldParams) -> np.ndarray:
    """Python ints (any nested list / iterable) -> ``(K, *batch)`` uint32
    digit array (canonical representatives, *not* Montgomery form)."""
    arr = np.asarray(values, dtype=object)
    K = fp.num_digits
    bits, mask = fp.digit_bits, fp.digit_mask
    out = np.empty((K,) + arr.shape, dtype=np.uint32)
    flat = arr.reshape(-1)
    out_flat = out.reshape(K, -1)
    for b, v in enumerate(flat):
        v = int(v) % fp.p
        for k in range(K):
            out_flat[k, b] = v & mask
            v >>= bits
    return out


def device_to_np(arr) -> np.ndarray:
    """Device array -> numpy via ``jax.device_get``.

    NEVER ``np.asarray`` a multi-dimensional device array here: through the
    tunneled TPU backend that falls back to per-row/element fetches
    (measured ~90 s for a (8, 8192) u32 array vs ~0 ms for device_get)."""
    import jax

    if isinstance(arr, jax.Array):
        return jax.device_get(arr)
    return np.asarray(arr)


def digits_to_ints_np(digits, fp: FieldParams = None) -> np.ndarray:
    """``(K, *batch)`` digit array -> object ndarray of Python ints."""
    bits = fp.digit_bits if fp is not None else 16
    digits = device_to_np(digits)
    K = digits.shape[0]
    flat = digits.reshape(K, -1)
    # vectorised big-int assembly: K object-array ops instead of a Python
    # loop per element
    out = np.zeros(flat.shape[1], dtype=object)
    for k in range(K - 1, -1, -1):
        out = (out << bits) | flat[k].astype(object)
    return out.reshape(digits.shape[1:])


def const_digits(value: int, fp: FieldParams, batch_shape=()) -> jnp.ndarray:
    """Broadcast a single value (< 2^(bits*K)) to a ``(K, *batch)`` digit
    array."""
    host = np.zeros(fp.num_digits, dtype=np.uint32)
    v = int(value)
    for k in range(fp.num_digits):
        host[k] = v & fp.digit_mask
        v >>= fp.digit_bits
    arr = jnp.asarray(host)
    return jnp.broadcast_to(
        arr.reshape((fp.num_digits,) + (1,) * len(batch_shape)),
        (fp.num_digits,) + tuple(batch_shape),
    )


# ---------------------------------------------------------------------------
# digit-list core (internal): a value is a Python list of K (B,) uint32
# arrays.  The digit axis unrolls at trace time; only batch-shaped
# elementwise ops reach XLA.
# ---------------------------------------------------------------------------

def _unstack(a):
    return [a[k] for k in range(a.shape[0])]


def _int_digits(value: int, count: int, bits: int):
    mask = (1 << bits) - 1
    digs = []
    v = int(value)
    for _ in range(count):
        digs.append(v & mask)
        v >>= bits
    return digs


def _ks_carry_l(g, p):
    """Kogge–Stone carry-lookahead over digit lists.

    ``g[k]`` = digit k generates a carry, ``p[k]`` = digit k propagates
    (0/1 uint32 batch arrays).  Returns ``cin`` (carry INTO digit k) and
    ``cout`` (carry out of the top digit).  log2(K) unrolled rounds.
    """
    K = len(g)
    G, P = list(g), list(p)
    d = 1
    while d < K:
        G = [G[k] if k < d else G[k] | (P[k] & G[k - d]) for k in range(K)]
        P = [P[k] if k < d else P[k] & P[k - d] for k in range(K)]
        d *= 2
    zero = jnp.zeros_like(G[0])
    return [zero] + G[:-1], G[-1]


def _resolve_l(cols, bits: int, bound: int):
    """Resolve column sums (each <= ``bound``) into exact digit lists.

    Local folds bring the per-digit residue down to {0,1} carries (the
    fold count is a static function of ``bound``), then a single
    carry-lookahead finishes.  Any carry out of the top column is
    DROPPED — callers append zero columns when overflow is possible.
    """
    _checked(bound)
    mask_i = (1 << bits) - 1
    mask = U32(mask_i)
    sh = U32(bits)
    d = [c & mask for c in cols]
    carry = [x >> sh for x in cols]
    cb = bound >> bits
    while cb > 1:
        v = [d[0]] + [d[k] + carry[k - 1] for k in range(1, len(cols))]
        d = [x & mask for x in v]
        carry = [x >> sh for x in v]
        cb = (mask_i + cb) >> bits
    p = [(x == mask).astype(U32) for x in d]
    cin, _ = _ks_carry_l(carry, p)
    return [(d[k] + cin[k]) & mask for k in range(len(cols))]


def _add_l(a, b, bits: int, carry_in: int = 0):
    """Exact digit-list addition with carry-lookahead -> (digits, cout)."""
    mask = U32((1 << bits) - 1)
    sh = U32(bits)
    v = [a[k] + b[k] for k in range(len(a))]
    if carry_in:
        v[0] = v[0] + ONE
    d = [x & mask for x in v]
    g = [x >> sh for x in v]
    p = [(x == mask).astype(U32) for x in d]
    cin, cout = _ks_carry_l(g, p)
    return [(d[k] + cin[k]) & mask for k in range(len(a))], cout


def _sub_l(a, b, bits: int):
    """a - b over digit lists; returns (digits mod 2^(bits*K), no_borrow)."""
    mask = U32((1 << bits) - 1)
    comp = [mask - x for x in b]
    out, carry = _add_l(a, comp, bits, carry_in=1)
    return out, carry  # carry==1  <=>  a >= b


def _sub_const_l(a, const_digits_int, bits: int):
    """a - c where c is a static integer digit list."""
    mask_i = (1 << bits) - 1
    comp = [U32(mask_i - d) for d in const_digits_int]
    out, carry = _add_l(a, comp, bits, carry_in=1)
    return out, carry


def _add_const_l(a, const_digits_int, bits: int):
    b = [jnp.broadcast_to(U32(d), a[k].shape)
         for k, d in enumerate(const_digits_int)]
    return _add_l(a, b, bits)


def _cond_sub_p_l(digits, extra, fp: FieldParams):
    """Value = extra*2^(bits*K) + digits, known < 2p.  Canonical digit list.

    ``extra`` is a 0/1 batch array (or the int 0)."""
    sub, no_borrow = _sub_const_l(digits, fp.p_digits, fp.digit_bits)
    need = no_borrow == 1
    if not (isinstance(extra, int) and extra == 0):
        need = need | (extra > 0)
    return [jnp.where(need, sub[k], digits[k]) for k in range(len(digits))]


def _conv_l(x, y, fp: FieldParams):
    """Schoolbook product column sums of two digit lists -> (cols, bound).

    Returns Kx+Ky columns (the top one may be zero).  In split mode
    (16-bit digits) each 32-bit product contributes its lo part to column
    i+j and its hi part to i+j+1; in no-split mode (<= 13-bit digits) the
    raw product accumulates into column i+j directly.  Each product is
    computed once (shared across its columns and across the i<->j symmetry
    when squaring).
    """
    bits = fp.digit_bits
    Kx, Ky = len(x), len(y)
    same = x is y
    prod = {}
    for i in range(Kx):
        for j in range(Ky):
            if same and j < i:
                prod[(i, j)] = prod[(j, i)]
            else:
                prod[(i, j)] = x[i] * y[j]
    pmax = ((1 << bits) - 1) ** 2
    cols, bound = [], 0
    if fp.split_products:
        mask = U32((1 << bits) - 1)
        sh = U32(bits)
        for col in range(Kx + Ky):
            terms, b = [], 0
            for i in range(Kx):
                j = col - i
                if 0 <= j < Ky:
                    terms.append(prod[(i, j)] & mask)
                    b += (1 << bits) - 1
                j = col - 1 - i
                if 0 <= j < Ky:
                    terms.append(prod[(i, j)] >> sh)
                    b += pmax >> bits
            cols.append(functools.reduce(jnp.add, terms) if terms
                        else jnp.zeros_like(x[0]))
            bound = max(bound, b)
    else:
        for col in range(Kx + Ky):
            terms, b = [], 0
            for i in range(Kx):
                j = col - i
                if 0 <= j < Ky:
                    terms.append(prod[(i, j)])
                    b += pmax
            cols.append(functools.reduce(jnp.add, terms) if terms
                        else jnp.zeros_like(x[0]))
            bound = max(bound, b)
    return cols, _checked(bound)


def _conv_low_l(x, y, K: int, fp: FieldParams):
    """Low K columns only of ``_conv_l`` (for products taken mod R):
    roughly halves the multiply count when only T mod R is needed."""
    bits = fp.digit_bits
    Kx, Ky = len(x), len(y)
    prod = {}

    def get(i, j):
        if (i, j) not in prod:
            prod[(i, j)] = x[i] * y[j]
        return prod[(i, j)]

    pmax = ((1 << bits) - 1) ** 2
    cols, bound = [], 0
    if fp.split_products:
        mask = U32((1 << bits) - 1)
        sh = U32(bits)
        for col in range(K):
            terms, b = [], 0
            for i in range(Kx):
                j = col - i
                if 0 <= j < Ky:
                    terms.append(get(i, j) & mask)
                    b += (1 << bits) - 1
                j = col - 1 - i
                if 0 <= j < Ky:
                    terms.append(get(i, j) >> sh)
                    b += pmax >> bits
            cols.append(functools.reduce(jnp.add, terms) if terms
                        else jnp.zeros_like(x[0]))
            bound = max(bound, b)
    else:
        for col in range(K):
            terms, b = [], 0
            for i in range(Kx):
                j = col - i
                if 0 <= j < Ky:
                    terms.append(get(i, j))
                    b += pmax
            cols.append(functools.reduce(jnp.add, terms) if terms
                        else jnp.zeros_like(x[0]))
            bound = max(bound, b)
    return cols, _checked(bound)


def _conv_sparse_const_l(x, fp: FieldParams, total_len: int):
    """Column sums of x * p for the (static) modulus p: walks only p's
    nonzero digits, which enter as scalar constants.  -> (cols, bound)."""
    bits = fp.digit_bits
    K = len(x)
    terms = [[] for _ in range(total_len)]
    bounds = [0] * total_len
    dmax = (1 << bits) - 1
    if fp.split_products:
        mask = U32((1 << bits) - 1)
        sh = U32(bits)
        for j in fp.p_nonzero_digit_idx:
            pj = U32(fp.p_digits[j])
            for i in range(K):
                prod = x[i] * pj
                terms[j + i].append(prod & mask)
                bounds[j + i] += dmax
                terms[j + i + 1].append(prod >> sh)
                bounds[j + i + 1] += (dmax * fp.p_digits[j]) >> bits
    else:
        for j in fp.p_nonzero_digit_idx:
            pj = U32(fp.p_digits[j])
            for i in range(K):
                terms[j + i].append(x[i] * pj)
                bounds[j + i] += dmax * fp.p_digits[j]
    cols = [functools.reduce(jnp.add, t) if t else jnp.zeros_like(x[0])
            for t in terms]
    return cols, _checked(max(bounds))


# ---------------------------------------------------------------------------
# compact stacked core (internal): same algorithms expressed as a few dozen
# whole-(K, *B) array ops.  ~10x fewer XLA ops than the digit-list core at
# the cost of materialised (Kx, Ky, *B) product tensors, so it is selected
# for SMALL batches, where compile time dominates and the temporaries are
# cache-resident: scan bodies (Poseidon rounds, double-and-add ladders,
# Fermat inversion), host-sized prover glue, and the CPU test suite.
# Large batches (NTT/LDE/Merkle bulk) take the digit-list core, which
# fuses into O(batch)-memory loop nests.
# ---------------------------------------------------------------------------

# batch sizes >= this use the digit-list (fusion-friendly) core
_UNROLL_MIN = 1 << 13

# set by force_compact_core(): compile-time escape hatch for callers whose
# graphs contain MANY field ops (EC group law: ~16 multiplies per add,
# invoked from several scan bodies) — the digit-list core would emit
# hundreds of thousands of XLA ops and takes tens of minutes to compile on
# a 1-core host, while the compact core trades materialized (K,K,B)
# product tensors for a ~10x smaller module.
_FORCE_COMPACT = False


import contextlib


@contextlib.contextmanager
def force_compact_core():
    """Within this context (trace time), all limb ops use the compact
    stacked core regardless of batch size."""
    global _FORCE_COMPACT
    prev = _FORCE_COMPACT
    _FORCE_COMPACT = True
    try:
        yield
    finally:
        _FORCE_COMPACT = prev


def _is_big(*arrs) -> bool:
    if _FORCE_COMPACT:
        return False
    return max(
        _math.prod(a.shape[1:]) if a.ndim > 1 else 1 for a in arrs
    ) >= _UNROLL_MIN


def _lookahead_carry_c(g, p):
    """Kogge–Stone carry-lookahead over the digit axis (stacked form)."""
    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pa & pb)

    G, _P = jax.lax.associative_scan(combine, (g, p), axis=0)
    zeros = jnp.zeros_like(g[:1])
    cin = jnp.concatenate([zeros, G[:-1]], axis=0)
    return cin, G[-1]


def _carry_resolve_c(cols, bits: int, bound: int):
    """Stacked form of :func:`_resolve_l`."""
    _checked(bound)
    mask_i = (1 << bits) - 1
    mask = U32(mask_i)
    sh = U32(bits)
    d = cols & mask
    c = cols >> sh
    cb = bound >> bits
    while cb > 1:
        zeros = jnp.zeros_like(d[:1])
        v = d + jnp.concatenate([zeros, c[:-1]], axis=0)
        d = v & mask
        c = v >> sh
        cb = (mask_i + cb) >> bits
    p = (d == mask).astype(U32)
    cin, _ = _lookahead_carry_c(c, p)
    return (d + cin) & mask


def _add_digits_c(a, b, bits: int, carry_in=0):
    mask = U32((1 << bits) - 1)
    sh = U32(bits)
    v = a + b
    if carry_in:
        v = v.at[0].add(ONE)
    d = v & mask
    g = v >> sh
    p = (d == mask).astype(U32)
    cin, cout = _lookahead_carry_c(g, p)
    return (d + cin) & mask, cout


def _sub_digits_c(a, b, bits: int):
    comp = U32((1 << bits) - 1) - b
    out, carry = _add_digits_c(a, comp, bits, carry_in=1)
    return out, carry  # carry==1  <=>  a >= b


def _cond_sub_p_c(digits, extra, fp: FieldParams):
    pd = const_digits(fp.p, fp, digits.shape[1:])
    sub_, no_borrow = _sub_digits_c(digits, pd, fp.digit_bits)
    need = (extra > 0) | (no_borrow == 1)
    return jnp.where(need[None], sub_, digits)


def _skew_diag_sum(t):
    """Anti-diagonal sums of (Kx, Ky, *B) via the pad/reshape skew trick."""
    Kx, Ky = t.shape[0], t.shape[1]
    B = t.shape[2:]
    W = Kx + Ky - 1
    pad_width = [(0, 0)] * t.ndim
    pad_width[1] = (0, Kx)
    padded = jnp.pad(t, pad_width)  # (Kx, W+1, *B)
    flat = padded.reshape((Kx * (W + 1),) + B)
    flat = flat[: Kx * W]
    return flat.reshape((Kx, W) + B).sum(axis=0, dtype=U32)


def _conv_columns_c(x, y, fp: FieldParams):
    """Stacked column sums -> (cols of length Kx+Ky, bound)."""
    bits = fp.digit_bits
    prod = x[:, None] * y[None, :]  # (Kx, Ky, *B) exact in u32
    kmin = min(x.shape[0], y.shape[0])
    pmax = ((1 << bits) - 1) ** 2
    if fp.split_products:
        mask = U32((1 << bits) - 1)
        sh = U32(bits)
        s_lo = _skew_diag_sum(prod & mask)
        s_hi = _skew_diag_sum(prod >> sh)
        zeros = jnp.zeros_like(s_lo[:1])
        cols = (
            jnp.concatenate([s_lo, zeros], axis=0)
            + jnp.concatenate([zeros, s_hi], axis=0)
        )
        bound = kmin * ((1 << bits) - 1 + (pmax >> bits))
    else:
        s = _skew_diag_sum(prod)
        cols = jnp.concatenate([s, jnp.zeros_like(s[:1])], axis=0)
        bound = kmin * pmax
    return cols, _checked(bound)


def _conv_sparse_const_c(x, fp: FieldParams, total_len: int):
    bits = fp.digit_bits
    K = x.shape[0]
    B = x.shape[1:]
    cols = jnp.zeros((total_len,) + tuple(B), U32)
    dmax = (1 << bits) - 1
    bound = 0
    if fp.split_products:
        mask = U32((1 << bits) - 1)
        sh = U32(bits)
        for j in fp.p_nonzero_digit_idx:
            prod = x * U32(fp.p_digits[j])
            cols = cols.at[j: j + K].add(prod & mask)
            cols = cols.at[j + 1: j + 1 + K].add(prod >> sh)
            bound += dmax + ((dmax * fp.p_digits[j]) >> bits)
    else:
        for j in fp.p_nonzero_digit_idx:
            cols = cols.at[j: j + K].add(x * U32(fp.p_digits[j]))
            bound += dmax * fp.p_digits[j]
    return cols, _checked(bound)


def _mont_mul_c(a, b, fp: FieldParams):
    """Compact-graph Montgomery product (SOS algorithm)."""
    K = fp.num_digits
    bits = fp.digit_bits
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    t_cols, t_bound = _conv_columns_c(a, b, fp)
    t_low = _carry_resolve_c(t_cols[:K], bits, t_bound)
    mu = jnp.asarray(np.array(_mu_full_digits(fp), np.uint32)).reshape(
        (K,) + (1,) * len(batch)
    )
    q_cols, q_bound = _conv_columns_c(t_low, mu, fp)
    q = _carry_resolve_c(q_cols[:K], bits, q_bound)

    qp_cols, qp_bound = _conv_sparse_const_c(q, fp, 2 * K + 1)
    low_bound = _checked(t_bound + qp_bound)
    # The carry out of the low half is (T + q*p mod-R part) / R, bounded by
    # ~low_bound >> bits; with wide column sums it can span several digits,
    # so resolve with enough zero columns to capture it exactly.
    extra = _carry_digits(low_bound, bits)
    low_cols = t_cols[:K] + qp_cols[:K]
    low_ext = _carry_resolve_c(
        jnp.concatenate(
            [low_cols, jnp.zeros((extra,) + low_cols.shape[1:], U32)], axis=0
        ),
        bits,
        low_bound,
    )
    high_cols = (
        jnp.concatenate(
            [t_cols[K:], jnp.zeros((1,) + t_cols.shape[1:], U32)], axis=0
        )
        + qp_cols[K:]
    )
    high_cols = high_cols.at[:extra].add(low_ext[K:])
    mask_i = (1 << bits) - 1
    u = _carry_resolve_c(
        high_cols, bits, _checked(t_bound + qp_bound + mask_i)
    )
    return _cond_sub_p_c(u[:K], u[K], fp)


# ---------------------------------------------------------------------------
# public batched ops — all take/return (K, *batch) uint32 digit arrays
# ---------------------------------------------------------------------------

def add(a, b, fp: FieldParams):
    """Modular addition (same domain in = same domain out)."""
    a, b = jnp.broadcast_arrays(a, b)
    if not _is_big(a):
        s, carry = _add_digits_c(a, b, fp.digit_bits)
        return _cond_sub_p_c(s, carry, fp)
    s, carry = _add_l(_unstack(a), _unstack(b), fp.digit_bits)
    return jnp.stack(_cond_sub_p_l(s, carry, fp))


def sub(a, b, fp: FieldParams):
    """Modular subtraction."""
    a, b = jnp.broadcast_arrays(a, b)
    if not _is_big(a):
        d, no_borrow = _sub_digits_c(a, b, fp.digit_bits)
        pd = const_digits(fp.p, fp, d.shape[1:])
        fixed, _ = _add_digits_c(d, pd, fp.digit_bits)
        return jnp.where((no_borrow == 1)[None], d, fixed)
    d, no_borrow = _sub_l(_unstack(a), _unstack(b), fp.digit_bits)
    fixed, _ = _add_const_l(d, fp.p_digits, fp.digit_bits)
    ok = no_borrow == 1
    return jnp.stack([jnp.where(ok, d[k], fixed[k]) for k in range(len(d))])


def neg(a, fp: FieldParams):
    return sub(jnp.zeros_like(a), a, fp)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def equal(a, b):
    return jnp.all(a == b, axis=0)


def select(cond, a, b):
    """Elementwise select over the batch: cond ? a : b."""
    return jnp.where(cond[None], a, b)


def ge(a, b, fp: FieldParams = None):
    """a >= b as integers, over the batch."""
    a, b = jnp.broadcast_arrays(a, b)
    bits = fp.digit_bits if fp is not None else 16
    if not _is_big(a):
        _, no_borrow = _sub_digits_c(a, b, bits)
        return no_borrow == 1
    _, no_borrow = _sub_l(_unstack(a), _unstack(b), bits)
    return no_borrow == 1


@functools.lru_cache(maxsize=None)
def _mu_full_digits(fp: FieldParams) -> tuple:
    """-p^{-1} mod R as K digits (the SOS Montgomery quotient constant)."""
    r_mod = 1 << (fp.digit_bits * fp.num_digits)
    mu = (-pow(fp.p, -1, r_mod)) % r_mod
    return tuple(_int_digits(mu, fp.num_digits, fp.digit_bits))


def _mont_reduce_l(t_cols, fp: FieldParams, t_bound: int,
                   reduce_mod_p: bool = True):
    """Montgomery reduction of 2K product columns -> canonical digits
    (or, with ``reduce_mod_p=False``, a representative < 2p whose top
    carry the caller has proven zero — see :func:`mont_mul_lazy`).

    Two strategies, picked statically by modulus sparsity:

    * sparse moduli (Stark252, Goldilocks) use a CIOS-style digit
      recurrence in carry-save form: per digit one digit-wide quotient and
      nnz(p) products added into the running columns — ~4x fewer ops than
      SOS for Stark252.  The recurrence is digit-serial but every step is
      a full-batch vector op, so it costs depth, not lanes.
    * dense moduli fall back to SOS: q = (T mod R) * mu as a second
      convolution, then T + q*p.
    """
    K = fp.num_digits
    bits = fp.digit_bits
    nnz = len(fp.p_nonzero_digit_idx)
    if nnz * 2 <= K:
        return _mont_reduce_cios_l(t_cols, fp, t_bound, reduce_mod_p)
    t_low = _resolve_l(t_cols[:K], bits, t_bound)  # exact digits of T mod R
    mu = [jnp.broadcast_to(U32(d), t_low[0].shape)
          for d in _mu_full_digits(fp)]
    q_cols, q_bound = _conv_low_l(t_low, mu, K, fp)
    q = _resolve_l(q_cols, bits, q_bound)  # q = T*mu mod R

    qp_cols, qp_bound = _conv_sparse_const_l(q, fp, 2 * K + 1)
    # U = T + q*p; the low K columns are ≡ 0 mod R by construction, but
    # their carry out must flow into the high half.  With wide column sums
    # the carry spans several digits (~bound >> bits), so resolve with
    # enough zero columns to capture it exactly.
    bound = _checked(t_bound + qp_bound)
    extra = _carry_digits(bound, bits)
    low = [t_cols[k] + qp_cols[k] for k in range(K)]
    low_ext = _resolve_l(
        low + [jnp.zeros_like(low[0]) for _ in range(extra)], bits, bound
    )

    high = [t_cols[K + k] + qp_cols[K + k] for k in range(K)] + [qp_cols[2 * K]]
    for t in range(extra):
        high[t] = high[t] + low_ext[K + t]
    mask_i = (1 << bits) - 1
    u = _resolve_l(high, bits, _checked(bound + mask_i))  # K+1 digits
    if not reduce_mod_p:
        return u[:K]
    return _cond_sub_p_l(u[:K], u[K], fp)


def _mont_reduce_cios_l(t_cols, fp: FieldParams, t_bound: int,
                        reduce_mod_p: bool = True):
    """Carry-save CIOS reduction (sparse-modulus fast path).

    Invariant at step i: value V = sum cols[c]*2^(bits*c) with all columns
    below i already == 0 mod 2^bits and their carries propagated, so
    cols[i] & mask == (V / 2^(bits*i)) mod 2^bits exactly.  Then
    q_i = cols[i]*mu mod 2^bits zeroes digit i of V + q_i*p.  A static
    per-step bound guards uint32 exactness.
    """
    K = fp.num_digits
    bits = fp.digit_bits
    mask = U32((1 << bits) - 1)
    sh = U32(bits)
    mu = U32(fp.mu_digit)
    dmax = (1 << bits) - 1
    cols = list(t_cols)  # 2K columns
    cols.append(jnp.zeros_like(cols[0]))  # room for the top hi part
    bound = [t_bound] * (2 * K) + [0]
    for i in range(K):
        qi = ((cols[i] & mask) * mu) & mask
        if fp.split_products:
            for j in fp.p_nonzero_digit_idx:
                prod = qi * U32(fp.p_digits[j])
                cols[i + j] = cols[i + j] + (prod & mask)
                bound[i + j] += dmax
                cols[i + j + 1] = cols[i + j + 1] + (prod >> sh)
                bound[i + j + 1] += (dmax * fp.p_digits[j]) >> bits
        else:
            for j in fp.p_nonzero_digit_idx:
                cols[i + j] = cols[i + j] + qi * U32(fp.p_digits[j])
                bound[i + j] += dmax * fp.p_digits[j]
        # digit i is now 0 mod 2^bits; move its high part up
        cols[i + 1] = cols[i + 1] + (cols[i] >> sh)
        bound[i + 1] += _checked(bound[i]) >> bits
    u = _resolve_l(cols[K:], bits, _checked(max(bound[K:])))
    if not reduce_mod_p:
        return u[:K]
    return _cond_sub_p_l(u[:K], u[K], fp)


def mont_mul(a, b, fp: FieldParams):
    """Montgomery product a*b*R^{-1} mod p (R = 2^(bits*K))."""
    a, b = jnp.broadcast_arrays(a, b)
    if not _is_big(a):
        return _mont_mul_c(a, b, fp)
    t_cols, t_bound = _conv_l(_unstack(a), _unstack(b), fp)
    return jnp.stack(_mont_reduce_l(t_cols, fp, t_bound))


# ---------------------------------------------------------------------------
# lazy (redundant-representative) ops — the NTT butterfly fast path.
#
# A lazy value represents x mod p as any integer x' ≡ x with x' < c*p for a
# small statically-tracked c.  Montgomery multiplication accepts ANY K-digit
# operand pair whose value product stays below R*p and always emits < 2p, so
# skipping its final conditional subtraction (and batching the butterflies'
# add/sub reductions across stages) trades a bounded representative for
# ~15% of the butterfly's vector ops.  Callers thread static value bounds
# (Python ints); every bound is asserted at trace time.  Digit-list core
# only (identical on all batch sizes).
# ---------------------------------------------------------------------------

def mont_mul_lazy(a, b, fp: FieldParams, ab_value_bound: int):
    """a*b*R^{-1} without the final cond-subtract -> (digits, value_bound).

    Requires ab_value_bound (a static bound on the *integer* product of the
    operands' values) < R*p; the result value is < ab_value_bound/R + p
    (always < 2p)."""
    r_mod = 1 << (fp.digit_bits * fp.num_digits)
    if ab_value_bound >= r_mod * fp.p:
        raise OverflowError("lazy Montgomery product bound exceeds R*p")
    out_bound = ab_value_bound // r_mod + fp.p + 1
    if out_bound >= r_mod:
        raise OverflowError("lazy Montgomery output exceeds digit capacity")
    a, b = jnp.broadcast_arrays(a, b)
    t_cols, t_bound = _conv_l(_unstack(a), _unstack(b), fp)
    u = _mont_reduce_l(t_cols, fp, t_bound, reduce_mod_p=False)
    return jnp.stack(u), out_bound


def add_raw(a, b, fp: FieldParams, value_bound: int):
    """Plain multi-digit a+b (no modular reduction); value_bound is the
    static bound on the RESULT, which must fit in K digits."""
    if value_bound >= 1 << (fp.digit_bits * fp.num_digits):
        raise OverflowError("lazy add exceeds digit capacity")
    a, b = jnp.broadcast_arrays(a, b)
    s, _carry = _add_l(_unstack(a), _unstack(b), fp.digit_bits)
    return jnp.stack(s)


def sub_offset_raw(a, b, offset: int, fp: FieldParams, value_bound: int):
    """a - b + offset (offset a static int >= bound(b), so the result is
    non-negative; value_bound bounds the result, which must fit in K
    digits).  One fused three-way column resolve."""
    bits = fp.digit_bits
    K = fp.num_digits
    if value_bound >= 1 << (bits * K):
        raise OverflowError("lazy sub exceeds digit capacity")
    mask_i = (1 << bits) - 1
    # a + (2^(bits*K) - 1 - b) + (offset + 1): the 2^(bits*K) wraps away
    # because the true result lies in [0, R)
    cd = _int_digits(offset + 1, K, bits)
    a, b = jnp.broadcast_arrays(a, b)
    al, bl = _unstack(a), _unstack(b)
    cols = [al[k] + (U32(mask_i) - bl[k]) + U32(cd[k]) for k in range(K)]
    return jnp.stack(_resolve_l(cols, bits, 3 * mask_i))


def cond_sub_const(x, c_value: int, fp: FieldParams):
    """x if x < c_value else x - c_value (digit-list core)."""
    xl = _unstack(x)
    cd = _int_digits(c_value, fp.num_digits, fp.digit_bits)
    sub_, no_borrow = _sub_const_l(xl, cd, fp.digit_bits)
    ok = no_borrow == 1
    return jnp.stack(
        [jnp.where(ok, sub_[k], xl[k]) for k in range(len(xl))]
    )


def mont_square(a, fp: FieldParams):
    if not _is_big(a):
        return _mont_mul_c(a, a, fp)
    al = _unstack(a)
    t_cols, t_bound = _conv_l(al, al, fp)  # shares the symmetric products
    return jnp.stack(_mont_reduce_l(t_cols, fp, t_bound))


def to_mont(a, fp: FieldParams):
    """Canonical digits -> Montgomery domain (multiply by R^2)."""
    r2 = const_digits(fp.r2, fp, ())
    r2 = r2.reshape((fp.num_digits,) + (1,) * (a.ndim - 1))
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), fp)


def from_mont(a, fp: FieldParams):
    """Montgomery domain -> canonical digits (multiply by 1).

    With b = 1 the product columns are just a's digits, so skip the
    convolution and run the reduction directly.
    """
    if not _is_big(a):
        one = const_digits(1, fp, ())
        one = one.reshape((fp.num_digits,) + (1,) * (a.ndim - 1))
        return _mont_mul_c(a, jnp.broadcast_to(one, a.shape), fp)
    al = _unstack(a)
    K = fp.num_digits
    zeros = [jnp.zeros_like(al[0]) for _ in range(K)]
    return jnp.stack(_mont_reduce_l(al + zeros, fp, fp.digit_mask))


def mont_pow(a, exponent: int, fp: FieldParams):
    """Static-exponent power in the Montgomery domain.

    Short exponents unroll; long ones (Fermat inversion, sqrt) run as a
    ``lax.scan`` over the exponent bits so the program stays one body.
    """
    if exponent < 0:
        raise ValueError("negative exponent; invert first")
    if exponent == 0:
        return const_digits(fp.r, fp, a.shape[1:])
    bits = bin(exponent)[2:]
    if len(bits) <= 16:
        result = a
        for bit in bits[1:]:
            result = mont_square(result, fp)
            if bit == "1":
                result = mont_mul(result, a, fp)
        return result

    bit_arr = jnp.asarray(np.array([int(c) for c in bits[1:]], np.uint32))

    def body(acc, bit):
        acc = mont_square(acc, fp)
        acc = select(bit == 1, mont_mul(acc, a, fp), acc)
        return acc, None

    result, _ = jax.lax.scan(body, a, bit_arr)
    return result


def mont_inv(a, fp: FieldParams):
    """Fermat inversion: mont_pow keeps the Montgomery domain."""
    return mont_pow(a, fp.p - 2, fp)


def batch_inverse(a, fp: FieldParams):
    """Montgomery-trick batch inversion along the *last* axis.

    Counterpart of ``FieldElement::inplace_batch_inverse``
    (``math/src/field/element.rs:47``).  Zeros map to zero.

    Two regimes, chosen by compile economics on this backend:

    * small N: log-depth prefix/suffix products via
      ``lax.associative_scan`` — minimal runtime muls, but the scan tree
      UNROLLS (~2 log2 N full Montgomery multiplies in the HLO), which at
      N >= 2^12 made this single op a multi-minute remote compile;
    * large N: serial-chunk formulation — view the axis as (C, L=64)
      chunks, prefix-scan along L (``lax.scan``: ONE mul in the program
      body), Fermat-invert all C chunk totals elementwise (small scan
      body), back-substitute with a second L-scan (two muls).  ~2x the
      runtime multiplies, a ~50x smaller program.
    """
    zmask = is_zero(a)
    one_all = const_digits(fp.r, fp, a.shape[1:])
    safe = jnp.where(zmask[None], one_all, a)
    N = a.shape[-1]
    L = 64

    if N < 2 * L or N % L:
        mul = lambda x, y: mont_mul(x, y, fp)
        prefix = jax.lax.associative_scan(mul, safe, axis=-1)
        suffix = jnp.flip(
            jax.lax.associative_scan(mul, jnp.flip(safe, axis=-1), axis=-1),
            axis=-1,
        )
        total_inv = mont_inv(prefix[..., -1], fp)

        left = jnp.concatenate([one_all[..., :1], prefix[..., :-1]], axis=-1)
        right = jnp.concatenate([suffix[..., 1:], one_all[..., :1]], axis=-1)
        out = mont_mul(mont_mul(left, right, fp), total_inv[..., None], fp)
        return jnp.where(zmask[None], jnp.zeros_like(out), out)

    K = a.shape[0]
    batch = a.shape[1:-1]
    C = N // L
    v = safe.reshape((K,) + batch + (C, L))
    xs = jnp.moveaxis(v, -1, 0)  # (L, K, *batch, C)
    ones_c = const_digits(fp.r, fp, batch + (C,))

    def fwd(carry, x):
        nxt = mont_mul(carry, x, fp)
        return nxt, nxt

    total, prefix = jax.lax.scan(fwd, ones_c, xs)
    total_inv = mont_inv(total, fp)  # elementwise Fermat over C lanes

    # backward: run_l = inv(prefix[l]); out[l] = run_l * prefix[l-1];
    # run_{l-1} = run_l * x[l]
    pprev = jnp.concatenate([ones_c[None], prefix[:-1]], axis=0)

    def bwd(run, inp):
        x, pp = inp
        out = mont_mul(run, pp, fp)
        return mont_mul(run, x, fp), out

    _, outs_rev = jax.lax.scan(
        bwd, total_inv, (jnp.flip(xs, 0), jnp.flip(pprev, 0)))
    outs = jnp.flip(outs_rev, 0)  # (L, K, *batch, C)
    out = jnp.moveaxis(outs, 0, -1).reshape(a.shape)
    return jnp.where(zmask[None], jnp.zeros_like(out), out)
