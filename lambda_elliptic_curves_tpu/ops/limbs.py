"""Batched multi-precision field arithmetic on 16-bit digit planes.

TPU-native replacement for lambdaworks' ``UnsignedInteger`` / Montgomery
CIOS core (``math/src/unsigned_integer/element.rs:35``,
``math/src/unsigned_integer/montgomery.rs:12``).  The design is dictated by
TPU hardware: no 64-bit integers and no widening multiply, but ``uint32``
lane multiplies are exact for 16x16-bit operands.  An element of F_p is a
little-endian vector of K 16-bit digits in ``uint32`` lanes; a batch is a
``(K, *batch)`` digit-major array whose planes are contiguous batch vectors
(perfect 8x128 VPU tiling).

Unlike a CPU bignum (digit-serial loops), every primitive here is built
from *lane-parallel* vector ops so that XLA emits a handful of large fused
loops and zero sequential digit chains:

* products: one broadcast multiply + anti-diagonal column sums via the
  pad/reshape skew trick (no gathers, no scatters);
* Montgomery reduction: SOS form — q = T*(-p^-1) mod R as a second
  convolution, then T + q*p — instead of a serial CIOS recurrence;
* carries/borrows: Kogge–Stone carry-lookahead over the digit axis using
  ``lax.associative_scan`` on (generate, propagate) pairs.

Zero digits of the modulus are exploited statically: the q*p convolution
walks only p's nonzero digits, which makes sparse moduli (Stark252: 3 of
16 digits; Goldilocks: 3 of 4) much cheaper — the TPU analogue of the
reference's spare-bit CIOS optimisation.

Everything is pure jnp: it runs identically on CPU (tests) and TPU, compiles
in milliseconds (op count is O(K) with tiny constants, not O(K^2)), and the
same routines are reused verbatim inside Pallas kernel bodies.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.params import DIGIT_BITS, DIGIT_MASK, FieldParams

U32 = jnp.uint32
MASK = jnp.uint32(DIGIT_MASK)
ONE = jnp.uint32(1)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def ints_to_digits_np(values, fp: FieldParams) -> np.ndarray:
    """Python ints (any nested list / iterable) -> ``(K, *batch)`` uint32
    digit array (canonical representatives, *not* Montgomery form)."""
    arr = np.asarray(values, dtype=object)
    K = fp.num_digits
    out = np.empty((K,) + arr.shape, dtype=np.uint32)
    flat = arr.reshape(-1)
    out_flat = out.reshape(K, -1)
    for b, v in enumerate(flat):
        v = int(v) % fp.p
        for k in range(K):
            out_flat[k, b] = v & DIGIT_MASK
            v >>= DIGIT_BITS
    return out


def digits_to_ints_np(digits, fp: FieldParams = None) -> np.ndarray:
    """``(K, *batch)`` digit array -> object ndarray of Python ints."""
    digits = np.asarray(digits)
    K = digits.shape[0]
    flat = digits.reshape(K, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for b in range(flat.shape[1]):
        v = 0
        for k in range(K - 1, -1, -1):
            v = (v << DIGIT_BITS) | int(flat[k, b])
        out[b] = v
    return out.reshape(digits.shape[1:])


def const_digits(value: int, fp: FieldParams, batch_shape=()) -> jnp.ndarray:
    """Broadcast a single value (< 2^(16K)) to a ``(K, *batch)`` digit array."""
    host = np.zeros(fp.num_digits, dtype=np.uint32)
    v = int(value)
    for k in range(fp.num_digits):
        host[k] = v & DIGIT_MASK
        v >>= DIGIT_BITS
    arr = jnp.asarray(host)
    return jnp.broadcast_to(
        arr.reshape((fp.num_digits,) + (1,) * len(batch_shape)),
        (fp.num_digits,) + tuple(batch_shape),
    )


# ---------------------------------------------------------------------------
# carry machinery (lane-parallel, no ripple chains)
# ---------------------------------------------------------------------------

def _lookahead_carry(g, p):
    """Kogge–Stone carry-lookahead.

    ``g[k]`` = digit k generates a carry, ``p[k]`` = digit k propagates
    (all 0/1 uint32, digit axis 0).  Returns ``cin`` (carry INTO digit k)
    and ``carry_out`` (carry out of the top digit).
    """
    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pa & pb)

    G, _P = jax.lax.associative_scan(combine, (g, p), axis=0)
    zeros = jnp.zeros_like(g[:1])
    cin = jnp.concatenate([zeros, G[:-1]], axis=0)
    return cin, G[-1]


def _carry_resolve(cols):
    """Resolve column sums (each < 2^22) into exact 16-bit digits.

    Two local splits bring per-digit residue down to {0,1} carries, then a
    single carry-lookahead finishes.  Any value overflowing the top column
    is DROPPED — callers append zero columns when overflow is possible.
    """
    d = cols & MASK
    c = cols >> DIGIT_BITS  # < 2^6
    zeros = jnp.zeros_like(d[:1])
    v = d + jnp.concatenate([zeros, c[:-1]], axis=0)  # <= 0xffff + 63
    dd = v & MASK
    g = v >> DIGIT_BITS  # in {0,1}
    p = (dd == MASK).astype(U32)
    cin, _ = _lookahead_carry(g, p)
    return (dd + cin) & MASK


def _add_digits(a, b, carry_in=0):
    """Exact digit-vector addition with carry-lookahead.

    Returns (digits, carry_out).  ``carry_in`` is a Python 0/1."""
    v = a + b
    if carry_in:
        v = v.at[0].add(ONE)
    d = v & MASK
    g = v >> DIGIT_BITS
    p = (d == MASK).astype(U32)
    cin, cout = _lookahead_carry(g, p)
    return (d + cin) & MASK, cout


def _sub_digits(a, b):
    """a - b over digit vectors; returns (digits mod 2^(16K), no_borrow)."""
    comp = MASK - b
    out, carry = _add_digits(a, comp, carry_in=1)
    return out, carry  # carry==1  <=>  a >= b


def _cond_sub_p(digits, extra, fp: FieldParams):
    """Value = extra*2^(16K) + digits, known < 2p.  Return canonical digits."""
    pd = const_digits(fp.p, fp, digits.shape[1:])
    sub, no_borrow = _sub_digits(digits, pd)
    need = (extra > 0) | (no_borrow == 1)
    return jnp.where(need[None], sub, digits)


# ---------------------------------------------------------------------------
# convolution (schoolbook product as columns) via the pad/reshape skew trick
# ---------------------------------------------------------------------------

def _skew_diag_sum(t):
    """Anti-diagonal sums: ``t`` is (Kx, Ky, *B); returns (Kx+Ky-1, *B) with
    out[c] = sum_{i+j=c} t[i, j].  Implemented by padding each row to width
    Ky+1 so that flattening skews row i right by i, then reshaping — pure
    pad/reshape/slice, no gathers."""
    Kx, Ky = t.shape[0], t.shape[1]
    B = t.shape[2:]
    W = Kx + Ky - 1
    pad_width = [(0, 0)] * t.ndim
    pad_width[1] = (0, Kx)  # row width Ky + Kx = W + 1
    padded = jnp.pad(t, pad_width)  # (Kx, W+1, *B)
    flat = padded.reshape((Kx * (W + 1),) + B)
    flat = flat[: Kx * W]
    return flat.reshape((Kx, W) + B).sum(axis=0, dtype=U32)


def _conv_columns(x, y):
    """Column sums of the product of two digit vectors.

    x: (Kx, *B), y: (Ky, *B or broadcastable) with 16-bit digits.
    Returns (Kx+Ky, *B) column sums, each < (Kx+Ky)*2^17 (safe < 2^22 for
    K <= 24).  lo parts land at column i+j, hi parts at i+j+1.
    """
    prod = x[:, None] * y[None, :]  # (Kx, Ky, *B) exact 16x16 in u32
    lo = prod & MASK
    hi = prod >> DIGIT_BITS
    s_lo = _skew_diag_sum(lo)  # (Kx+Ky-1, *B), columns i+j
    s_hi = _skew_diag_sum(hi)  # columns i+j (+1 shift below)
    zeros = jnp.zeros_like(s_lo[:1])
    return (
        jnp.concatenate([s_lo, zeros], axis=0)
        + jnp.concatenate([zeros, s_hi], axis=0)
    )


def _conv_columns_sparse_const(x, fp: FieldParams, total_len: int):
    """Column sums of x * p where p is the (static) modulus: walks only p's
    nonzero digits.  Returns (total_len, *B)."""
    K = x.shape[0]
    B = x.shape[1:]
    cols = jnp.zeros((total_len,) + tuple(B), U32)
    for j in fp.p_nonzero_digit_idx:
        prod = x * U32(fp.p_digits[j])
        cols = cols.at[j : j + K].add(prod & MASK)
        cols = cols.at[j + 1 : j + 1 + K].add(prod >> DIGIT_BITS)
    return cols


# ---------------------------------------------------------------------------
# public batched ops — all take/return (K, *batch) uint32 digit arrays
# ---------------------------------------------------------------------------

def add(a, b, fp: FieldParams):
    """Modular addition (same domain in = same domain out)."""
    s, carry = _add_digits(a, b)
    return _cond_sub_p(s, carry, fp)


def sub(a, b, fp: FieldParams):
    """Modular subtraction."""
    d, no_borrow = _sub_digits(a, b)
    pd = const_digits(fp.p, fp, d.shape[1:])
    fixed, _ = _add_digits(d, pd)
    return jnp.where((no_borrow == 1)[None], d, fixed)


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
    _, no_borrow = _sub_digits(a, b)
    return no_borrow == 1


@functools.lru_cache(maxsize=None)
def _mu_full_digits(fp: FieldParams) -> tuple:
    """-p^{-1} mod R as K digits (the SOS Montgomery quotient constant)."""
    r_mod = 1 << (DIGIT_BITS * fp.num_digits)
    mu = (-pow(fp.p, -1, r_mod)) % r_mod
    digs = []
    for _ in range(fp.num_digits):
        digs.append(mu & DIGIT_MASK)
        mu >>= DIGIT_BITS
    return tuple(digs)


def mont_mul(a, b, fp: FieldParams):
    """Montgomery product a*b*R^{-1} mod p (R = 2^(16K)).

    SOS (separated operand scanning) formulation, fully lane-parallel:
      T = a*b;  q = (T mod R) * (-p^{-1} mod R) mod R;  U = (T + q*p) / R;
      U < 2p, one conditional subtract.
    """
    K = fp.num_digits
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    t_cols = _conv_columns(a, b)  # (2K, *B) columns of T
    t_low = _carry_resolve(t_cols[:K])  # exact digits of T mod R
    mu = jnp.asarray(np.array(_mu_full_digits(fp), np.uint32)).reshape(
        (K,) + (1,) * len(batch)
    )
    q_cols = _conv_columns(t_low, mu)[:K]
    q = _carry_resolve(q_cols)  # q = T * mu mod R, exact digits

    qp_cols = _conv_columns_sparse_const(q, fp, 2 * K + 1)
    # U = T + q*p ; low K columns are ≡ 0 mod R by construction.
    # high half: T_high raw columns + low-half carry + qp high columns +
    # carry out of the (low half of T + low half of qp).
    low_cols = t_cols[:K] + qp_cols[:K]
    # carry out of low half: resolve with one extra column
    low_ext = _carry_resolve(
        jnp.concatenate(
            [low_cols, jnp.zeros((1,) + low_cols.shape[1:], U32)], axis=0
        )
    )
    low_carry = low_ext[K]

    high_cols = (
        jnp.concatenate([t_cols[K:], jnp.zeros((1,) + t_cols.shape[1:], U32)], axis=0)
        + qp_cols[K:]
    )
    high_cols = high_cols.at[0].add(low_carry)
    u = _carry_resolve(high_cols)  # (K+1, *B)
    return _cond_sub_p(u[:K], u[K], fp)


def mont_square(a, fp: FieldParams):
    return mont_mul(a, a, fp)


def to_mont(a, fp: FieldParams):
    """Canonical digits -> Montgomery domain (multiply by R^2)."""
    r2 = const_digits(fp.r2, fp, ())
    r2 = r2.reshape((fp.num_digits,) + (1,) * (a.ndim - 1))
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), fp)


def from_mont(a, fp: FieldParams):
    """Montgomery domain -> canonical digits (multiply by 1)."""
    one = const_digits(1, fp, ())
    one = one.reshape((fp.num_digits,) + (1,) * (a.ndim - 1))
    return mont_mul(a, jnp.broadcast_to(one, a.shape), fp)


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
            result = mont_mul(result, result, fp)
            if bit == "1":
                result = mont_mul(result, a, fp)
        return result

    bit_arr = jnp.asarray(np.array([int(c) for c in bits[1:]], np.uint32))

    def body(acc, bit):
        acc = mont_mul(acc, acc, fp)
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
    (``math/src/field/element.rs:47``) reformulated for SPMD hardware:
    log-depth prefix/suffix products via ``lax.associative_scan`` plus a
    single Fermat inversion.  Zeros map to zero.
    """
    zmask = is_zero(a)
    one_all = const_digits(fp.r, fp, a.shape[1:])
    safe = jnp.where(zmask[None], one_all, a)

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
