"""MXU-native NTT: radix-m DFT steps as integer matmuls on the systolic
array.

The measured cost profile of the Pease/four-step NTT on this hardware
(ROADMAP: ~11.6 ms/stage at 2^22, of which ~5.5 ms is the perfect-shuffle
data movement) is dominated by memory traffic — 22 shuffled passes over
the full digit array.  The MXU path replaces each *local* transform of the
four-step recursion with a direct DFT-matrix multiply:

    X[k] = sum_j w^{jk} x[j]        (an m x m matmul over F_p)

executed as ONE integer matmul over bit-planes.  Field elements are split
into ``plane_bits``-wide planes (p_i) and the twiddle matrix into planes
(q_i); the product of two split values is a convolution over plane pairs,
and by building the left matrix as

    W'[(s, k), (j, q)] = plane_{s-q}(w_mont[k, j])      (0 <= s-q < P)

the plane convolution *and* the m-point DFT sum happen inside a single
``dot_general`` with exact int32 accumulation — int8/uint8 operands on the
MXU at its highest throughput, no shuffles, no per-stage HBM round trips.
The wide int32 plane output is then carry-normalised and fed through a
widened Montgomery (CIOS) reduction.

Montgomery bookkeeping: inputs are Montgomery digits (x*R).  The twiddle
matrix stores w^{jk} * R * 2^{bits*extra} mod p, and the reduction runs
``K + extra`` CIOS steps (i.e. divides by R' = R * 2^{bits*extra}), so the
output is exactly sum(w^{jk} x_j) * R — Montgomery form again.  ``extra``
gives the headroom that makes T = sum of m Montgomery products < R' * p,
which a single reduction requires.

Parity role: this is the TPU answer to the reference's GPU butterfly
kernels (``math/src/gpu/metal/shaders/fft.h.metal``,
``fft/cpu/fft.rs:20``) — same API surface, hardware-native decomposition.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

from ..fields.field import PrimeField
from ..ops import limbs
from ..ops.limbs import U32, _cond_sub_p_l, _resolve_l
from . import ntt


# largest local transform executed as a single matmul
_MXU_BASE = 128
# operand plane width: 7 keeps every plane value in [0, 127] so both
# matmul operands are int8-safe on any backend; 8 (uint8) is selectable
# where u8 x u8 -> s32 dots are supported.
_PLANE_BITS = 7


def _extra_steps(field: PrimeField, m: int) -> int:
    """CIOS steps beyond K so that m * p^2 < R' * p (single-reduction
    headroom for an m-term sum of Montgomery products)."""
    fp = field.params
    r = 1 << (fp.digit_bits * fp.num_digits)
    extra = 0
    while (r << (fp.digit_bits * extra)) <= m * fp.p:
        extra += 1
    return max(extra, 1)


def _num_planes(field: PrimeField, plane_bits: int) -> int:
    total = field.params.digit_bits * field.params.num_digits
    return -(-total // plane_bits)


def _digits_to_planes(arr, field: PrimeField, plane_bits: int):
    """(K, ...) digit array (canonical, digit_bits wide) -> (P, ...) planes
    of ``plane_bits`` bits, little-endian, values < 2^plane_bits."""
    fp = field.params
    bits = fp.digit_bits
    P = _num_planes(field, plane_bits)
    total = fp.num_digits * bits
    planes = []
    for s in range(P):
        lo_bit = s * plane_bits
        hi_bit = min(lo_bit + plane_bits, total)
        d0, o0 = divmod(lo_bit, bits)
        piece = arr[d0] >> U32(o0)
        avail = bits - o0
        if avail < hi_bit - lo_bit and d0 + 1 < fp.num_digits:
            piece = piece | (arr[d0 + 1] << U32(avail))
        planes.append(piece & U32((1 << (hi_bit - lo_bit)) - 1))
    return jnp.stack(planes)


def _normalize_planes(planes_u32, plane_bits: int, bound: int):
    """Carry-propagate plane values down to < 2^(plane_bits) + slack so a
    subsequent ``<< off`` (off < digit_bits) cannot overflow uint32.
    Returns (list of plane arrays, new per-plane bound)."""
    mask = U32((1 << plane_bits) - 1)
    sh = U32(plane_bits)
    planes = [planes_u32[s] for s in range(planes_u32.shape[0])]
    while bound >= 1 << 16:
        carry_bound = bound >> plane_bits
        nxt = [planes[0] & mask]
        for s in range(1, len(planes)):
            nxt.append((planes[s] & mask) + (planes[s - 1] >> sh))
        nxt.append(planes[-1] >> sh)  # final carry plane
        planes = nxt
        bound = ((1 << plane_bits) - 1) + carry_bound
    return planes, bound


def _planes_to_columns(planes_i32, field: PrimeField, plane_bits: int,
                       plane_bound: int):
    """int32 plane-weighted value (planes s, weight 2^(plane_bits*s)) ->
    list of exact digit columns, via carry normalisation + one resolve
    pass.  Returns (cols list of u32 arrays, per-column static bound)."""
    fp = field.params
    bits = fp.digit_bits
    planes, pbound = _normalize_planes(planes_i32.astype(jnp.uint32),
                                       plane_bits, plane_bound)
    assert (pbound << (bits - 1)) < (1 << 32)
    ncols = -(-(len(planes) * plane_bits) // bits) + 1
    cols = [jnp.zeros(planes[0].shape, jnp.uint32) for _ in range(ncols)]
    bounds = [0] * ncols
    mask = U32((1 << bits) - 1)
    for s, plane in enumerate(planes):
        d, off = divmod(s * plane_bits, bits)
        shifted_bound = pbound << off
        cols[d] = cols[d] + ((plane << U32(off)) & mask)
        bounds[d] += min(shifted_bound, (1 << bits) - 1)
        if shifted_bound >> bits:
            cols[d + 1] = cols[d + 1] + (plane >> U32(bits - off))
            bounds[d + 1] += shifted_bound >> bits
    bound = limbs._checked(max(bounds))
    extra_cols = limbs._carry_digits(bound, bits)
    cols = cols + [jnp.zeros_like(cols[0]) for _ in range(extra_cols)]
    exact = _resolve_l(cols, bits, bound)
    return exact, (1 << bits) - 1


def _mont_reduce_wide(cols, field: PrimeField, col_bound: int, steps: int):
    """CIOS Montgomery reduction dividing by 2^(digit_bits*steps), for
    column lists longer than the standard 2K (mirrors
    ``limbs._mont_reduce_cios_l`` with a parametric step count)."""
    fp = field.params
    K = fp.num_digits
    bits = fp.digit_bits
    mask = U32((1 << bits) - 1)
    sh = U32(bits)
    mu = U32(fp.mu_digit)
    dmax = (1 << bits) - 1
    cols = list(cols)
    need = steps + K + 2
    while len(cols) < need:
        cols.append(jnp.zeros_like(cols[0]))
    bound = [col_bound] * len(cols)
    for i in range(steps):
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
        cols[i + 1] = cols[i + 1] + (cols[i] >> sh)
        bound[i + 1] += limbs._checked(bound[i]) >> bits
    u = _resolve_l(cols[steps:steps + K + 1],
                   bits, limbs._checked(max(bound[steps:steps + K + 1])))
    return _cond_sub_p_l(u[:K], u[K], fp)


def _dft_matrix_planes(field: PrimeField, root_int: int, m: int,
                       plane_bits: int, extra: int, dtype):
    """In-graph build of W'[(s, k_out), (j, q)] — small-constant safe:
    everything derives from an m-length twiddle ladder (ROADMAP: the
    tunneled backend rejects megabyte constant tables, so the 30+ MB
    matrix must be *computed* in the graph, not embedded)."""
    fp = field.params
    # w^t * R * 2^(bits*extra) mod p for t = 0..m-1, Montgomery digits
    wpows = ntt.powers(field, root_int, m)  # (K, m) = w^t * R
    shift_const = pow(2, fp.digit_bits * extra, fp.p)
    wpows = field.mul(
        wpows, field.constant(shift_const, (m,)))  # * 2^(bits*extra)
    idx = (lax.broadcasted_iota(jnp.int32, (m, m), 0)
           * lax.broadcasted_iota(jnp.int32, (m, m), 1)) % m
    W = jnp.take(wpows, idx, axis=1)  # (K, m_out, m_in)
    Wb = _digits_to_planes(W, field, plane_bits)  # (P, K->flat, m, m)
    P = Wb.shape[0]
    S = 2 * P - 1
    # W'[(s, k), (j, q)] = Wb[s - q, k, j]
    shifted = [
        jnp.pad(Wb, ((q, S - P - q), (0, 0), (0, 0)))
        for q in range(P)
    ]
    Wp = jnp.stack(shifted, axis=2)  # (S, m_out, P(q), m_in)... axes below
    # current axes: (s, k_out from Wb axis1, j) stacked q at axis2 ->
    # (s, m_out, q, m_in)
    return Wp.reshape(S, m, P * m).astype(dtype), P, S


def dft_matmul(x, field: PrimeField, root_int: int,
               plane_bits: int = _PLANE_BITS, dtype=jnp.int8):
    """Direct m-point DFT along the last axis via one plane matmul.

    ``x``: (K, *batch, m) canonical Montgomery digits.  Returns the same
    shape, canonical Montgomery digits, natural order."""
    fp = field.params
    K = fp.num_digits
    m = x.shape[-1]
    batch = x.shape[1:-1]
    extra = _extra_steps(field, m)
    Wp, P, S = _dft_matrix_planes(field, root_int, m, plane_bits, extra,
                                  dtype)

    xb = _digits_to_planes(x, field, plane_bits)  # (P, K.., *batch, m)
    B = 1
    for d in batch:
        B *= d
    xb = xb.reshape(P, B, m)
    rhs = jnp.transpose(xb, (0, 2, 1)).reshape(P * m, B).astype(dtype)

    out = lax.dot_general(
        Wp.reshape(S * m, P * m), rhs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (S*m, B)
    out = out.reshape(S, m, B)

    # static bound on each plane sum: pairs(<=P) * m * (2^pb - 1)^2
    plane_max = (1 << plane_bits) - 1
    out_bound = P * m * plane_max * plane_max
    assert out_bound < (1 << 31), "int32 matmul accumulator would overflow"

    cols, col_bound = _planes_to_columns(out, field, plane_bits, out_bound)
    digits = _mont_reduce_wide(cols, field, col_bound, K + extra)
    y = jnp.stack(digits)  # (K, m, B)
    return jnp.transpose(y, (0, 2, 1)).reshape((K,) + batch + (m,))


def fft_with_root_mxu(x, field: PrimeField, root_int: int,
                      canonical: bool = True, plane_bits: int = _PLANE_BITS,
                      dtype=jnp.int8):
    """Natural-order transform along the last axis: four-step recursion
    with matmul-DFT base cases (drop-in for :func:`ntt.fft_with_root`)."""
    n = x.shape[-1]
    if n <= _MXU_BASE:
        y = dft_matmul(x, field, root_int, plane_bits, dtype)
        return y if canonical else (y, field.p)

    log_n = n.bit_length() - 1
    log_n1 = (log_n + 1) // 2
    n1 = 1 << log_n1
    n2 = n >> log_n1
    K = x.shape[0]
    batch = x.shape[1:-1]

    xm = x.reshape((K,) + batch + (n1, n2))
    xt = jnp.swapaxes(xm, -1, -2)
    a, _ = fft_with_root_mxu(xt, field, pow(root_int, n2, field.p),
                             canonical=False, plane_bits=plane_bits,
                             dtype=dtype)
    t = ntt._twiddle_matrix(field, root_int, n2, n1)
    t = t.reshape((K,) + (1,) * len(batch) + (n2, n1))
    b = field.mul(a, t)
    bt = jnp.swapaxes(b, -1, -2)
    c, _ = fft_with_root_mxu(bt, field, pow(root_int, n1, field.p),
                             canonical=False, plane_bits=plane_bits,
                             dtype=dtype)
    out = jnp.swapaxes(c, -1, -2)
    out = out.reshape((K,) + batch + (n,))
    return out if canonical else (out, field.p)


def fft(coeffs, field: PrimeField, plane_bits: int = _PLANE_BITS,
        dtype=jnp.int8):
    """Forward NTT (natural order), MXU path."""
    n = coeffs.shape[-1]
    root = field.params.primitive_root_of_unity(n.bit_length() - 1)
    return fft_with_root_mxu(coeffs, field, root, plane_bits=plane_bits,
                             dtype=dtype)


def ifft(evals, field: PrimeField, plane_bits: int = _PLANE_BITS,
         dtype=jnp.int8):
    """Inverse NTT (natural order), MXU path."""
    n = evals.shape[-1]
    root = field.params.primitive_root_of_unity(n.bit_length() - 1)
    inv_root = pow(root, field.p - 2, field.p)
    y = fft_with_root_mxu(evals, field, inv_root, plane_bits=plane_bits,
                          dtype=dtype)
    n_inv = field.constant(pow(n, field.p - 2, field.p), ())
    return field.mul(y, jnp.broadcast_to(
        n_inv.reshape((y.shape[0],) + (1,) * (y.ndim - 1)), y.shape))
