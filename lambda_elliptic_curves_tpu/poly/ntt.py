"""Number-theoretic transform (FFT over two-adic prime fields).

Parity surface: ``Polynomial::evaluate_fft / evaluate_offset_fft /
interpolate_fft / interpolate_offset_fft`` (``math/src/fft/polynomial.rs:
25,74,87,121``) and the twiddle/roots helpers
(``math/src/fft/cpu/roots_of_unity.rs:13-77``).

TPU-native design: the radix-2 DIT butterfly network is expressed as
``log2(n)`` reshape-broadcast-multiply array steps over digit-major
Montgomery arrays — each stage is a single fused elementwise pass at full
VPU width, with the twiddle vector broadcast across each butterfly group
(XLA materialises no per-butterfly control flow).  The output bit-reverse is
one static gather.  The same function serves every two-adic field because
fields are parameter records, not types.

Conventions match the reference exactly:
* ``fft`` returns evaluations in natural order: out[i] = P(w^i), with w the
  2^k-th principal root derived from the field's pinned two-adic generator
  by repeated squaring (``math/src/field/traits.rs:82``).
* ``interpolate_fft`` is its exact inverse (scales by n^{-1}).
* offset variants scale coefficients by offset powers before the transform
  (``evaluate_offset_fft``/``scale``, ``math/src/fft/polynomial.rs:74``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.field import PrimeField
from ..fields.params import DIGIT_BITS as DIGIT_BITS_
from ..utils.errors import FFTError


# ---------------------------------------------------------------------------
# roots / twiddles
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse_permute(x, axis=-1):
    """Static bit-reverse gather along ``axis`` (counterpart of
    ``in_place_bit_reverse_permute``, ``math/src/fft/cpu/bit_reversing.rs:2``)."""
    n = x.shape[axis]
    return jnp.take(x, jnp.asarray(_bitrev_indices(n)), axis=axis)


@functools.lru_cache(maxsize=None)
def _powers_runner(field: PrimeField, logc: int, count: int):
    def run(ctab, acc):
        iota = jax.lax.broadcasted_iota(jnp.uint32, (1, count), 1)[0]

        def body(j, acc):
            cj = jax.lax.dynamic_slice_in_dim(ctab, j, 1, axis=-1)  # (K, 1)
            bit = (iota >> j.astype(jnp.uint32)) & 1
            return field.select(bit == 1, field.mul(acc, cj), acc)

        return jax.lax.fori_loop(0, logc, body, acc)

    return jax.jit(run)


@functools.lru_cache(maxsize=512)
def powers(field: PrimeField, base_int: int, count: int, offset_int: int = 1):
    """Montgomery digit array (K, count) of offset * base^i, i in 0..count.

    Square-and-multiply over the *index bits*: entry i multiplies the
    constants base^(2^j) for each set bit j of i.  The constants are
    Python-int precomputed, so the device program is a fixed-shape
    ``fori_loop`` whose body is one select-multiply — one compile per
    count, O(count * log count) lane-parallel multiplies (the SPMD
    replacement for the reference's sequential successor scan,
    ``roots_of_unity.rs:34``).
    """
    p = field.p
    if count <= 1:
        return field.constant(offset_int % p, (max(count, 1),))
    logc = (count - 1).bit_length()
    fp = field.params
    # base^(2^j) in Montgomery form, as a (K, logc) host constant table
    tab = np.zeros((fp.num_digits, logc), np.uint32)
    for j in range(logc):
        v = (pow(base_int, 1 << j, p) * fp.r) % p
        for k in range(fp.num_digits):
            tab[k, j] = (v >> (DIGIT_BITS_ * k)) & ((1 << DIGIT_BITS_) - 1)
    acc = field.constant(offset_int % p, (count,))
    return _powers_runner(field, logc, count)(jnp.asarray(tab), acc)


def get_powers_of_primitive_root(field: PrimeField, order: int, count: int,
                                 config: str = "natural"):
    """Powers of the 2^order primitive root in one of the four reference
    configurations (``RootsConfig``, ``math/src/field/traits.rs:10``):
    natural | natural_inversed | bit_reverse | bit_reverse_inversed."""
    root = field.params.primitive_root_of_unity(order)
    if config in ("natural_inversed", "bit_reverse_inversed"):
        root = pow(root, field.p - 2, field.p)
    n = count
    if config.startswith("bit_reverse"):
        # bit-reverse order needs the full power-of-two table
        n = max(1, 1 << (count - 1).bit_length()) if count > 1 else 1
    out = powers(field, root, n)
    if config.startswith("bit_reverse"):
        out = bit_reverse_permute(out)
    return out[..., :count] if not config.startswith("bit_reverse") else out


def get_twiddles(field: PrimeField, order: int, config: str = "bit_reverse"):
    """n/2 twiddle factors for a 2^order transform (cf. ``get_twiddles``,
    ``roots_of_unity.rs:66``)."""
    if order > field.two_adicity:
        raise FFTError(
            f"{field.name}: order {order} exceeds two-adicity {field.two_adicity}"
        )
    return get_powers_of_primitive_root(field, order, (1 << order) // 2, config)


# ---------------------------------------------------------------------------
# core transform
# ---------------------------------------------------------------------------

_tw_cache: dict = {}   # (field, root_int, n) -> (K, n/2) bit-reversed
_mat_cache: dict = {}  # (field, root_int, n2, n1) -> (K, N2, N1) w^(j2*k1)

# Above this size, split as N1*N2 (four-step): two batched local transforms
# around one twiddle multiply and two transposes.  Local transforms then
# run over a short contiguous axis with big batch dims, so the per-stage
# twiddle gather and perfect shuffle touch only the small axis.
_FOUR_STEP_MIN = 1 << 14


def _local_twiddles(field: PrimeField, root_int: int, n: int):
    key = (field, root_int, n)
    if key not in _tw_cache:
        tw = powers(field, root_int, max(n // 2, 1))
        _tw_cache[key] = bit_reverse_permute(tw)
    return _tw_cache[key]


def _twiddle_matrix(field: PrimeField, root_int: int, n2: int, n1: int):
    """(K, N2, N1) table with [j2, k1] = root^(j2*k1): the cross twiddles of
    the four-step split, built by log2(N1) doubling steps over the column
    vector of w^j2 (cached per field/root/size)."""
    key = (field, root_int, n2, n1)
    if key not in _mat_cache:
        base = powers(field, root_int, n2)  # (K, N2): w^j2
        acc = field.ones((n2, 1))
        step = base[..., None]
        built = 1
        while built < n1:
            nxt = field.mul(acc, jnp.broadcast_to(step, acc.shape))
            acc = jnp.concatenate([acc, nxt], axis=-1)
            step = field.square(step)
            built *= 2
        _mat_cache[key] = acc[..., :n1]
    return _mat_cache[key]


def fft_with_root(x, field: PrimeField, root_int: int):
    """Natural-order transform along the last axis with an explicit
    primitive root (any power-of-two length, any batch dims).

    Large transforms use the four-step N = N1*N2 decomposition
    X[k2*N1 + k1] = sum_j2 w_N2^(j2 k2) [w^(j2 k1) sum_j1 w_N1^(j1 k1) x[j1*N2+j2]]
    (the single-chip analogue of the sharded NTT's all-to-all,
    ``parallel/ntt_sharded.py``); local transforms use the constant-geometry
    network of :func:`_fft_pease`.
    """
    n = x.shape[-1]
    if n <= _FOUR_STEP_MIN:
        return _fft_pease(x, field, root_int)

    log_n = n.bit_length() - 1
    log_n1 = (log_n + 1) // 2
    n1 = 1 << log_n1
    n2 = n >> log_n1
    K = x.shape[0]
    batch = x.shape[1:-1]

    xm = x.reshape((K,) + batch + (n1, n2))
    xt = jnp.swapaxes(xm, -1, -2)  # (..., j2, j1)
    a = fft_with_root(xt, field, pow(root_int, n2, field.p))  # A[j2, k1]
    t = _twiddle_matrix(field, root_int, n2, n1)
    t = t.reshape((K,) + (1,) * len(batch) + (n2, n1))
    b = field.mul(a, t)
    bt = jnp.swapaxes(b, -1, -2)  # (..., k1, j2)
    c = fft_with_root(bt, field, pow(root_int, n1, field.p))  # C[k1, k2]
    out = jnp.swapaxes(c, -1, -2)  # (..., k2, k1): flatten = k2*N1 + k1
    return out.reshape((K,) + batch + (n,))


def _fft_pease(x, field: PrimeField, root_int: int):
    """Natural-order transform along the last axis with an explicit
    primitive root (any power-of-two length, any batch dims).

    Constant-geometry (Pease) radix-2 DIT: every stage performs the SAME
    data movement — butterfly partner is always at distance n/2, followed
    by one perfect shuffle — so the whole transform is a single
    ``lax.fori_loop`` whose body holds exactly one Montgomery multiply.
    Compiled graph size is therefore O(1) in n (vs O(log n) unrolled
    stages), which matters both for compile latency and for keeping live
    HBM bounded at a few copies of the array.

    Derivation from the in-place NR network (``math/src/fft/cpu/fft.rs:20``):
    stage s of NR butterflies on index bit (S-1-s) with twiddle
    ``tw_br[top s bits]``.  Re-indexing the array at stage s by rotating
    the index bits right by s turns the butterfly bit into the TOP bit
    (constant distance n/2), makes the twiddle index ``r mod 2^s`` (the
    bottom s bits), and turns the stage-to-stage re-indexing into the
    fixed perfect shuffle y[v] <- y[rotr(v, 1)], i.e. reshape(2, n/2) ->
    transpose -> flatten.  After S stages the array is back in natural
    index order holding the bit-reversed spectrum; one static bit-reverse
    gather finishes.
    """
    n = x.shape[-1]
    if n == 1:
        return x
    K = x.shape[0]
    batch = x.shape[1:-1]
    stages = n.bit_length() - 1
    h = n // 2
    tw_br = _local_twiddles(field, root_int, n)  # (K, n/2)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, h), 1)  # (1, h)
    bshape = (1,) * len(batch)

    def body(s, y):
        a = y[..., :h]
        b = y[..., h:]
        idx = (lane & ((jnp.uint32(1) << s.astype(jnp.uint32)) - 1))[0]
        w = jnp.take(tw_br, idx, axis=-1)  # (K, h)
        w = w.reshape((K,) + bshape + (h,))
        wb = field.mul(w, b)
        y = jnp.concatenate([field.add(a, wb), field.sub(a, wb)], axis=-1)
        # perfect shuffle: y[v] <- y[rotr(v, 1)]
        y = y.reshape((K,) + batch + (2, h))
        y = jnp.swapaxes(y, -1, -2)
        return y.reshape((K,) + batch + (n,))

    y = jax.lax.fori_loop(0, stages, body, x)
    return bit_reverse_permute(y)


def _fft_core(x, field: PrimeField, twiddles_br):
    """Radix-2 DIT NR network over the last axis; returns bit-reversed order.

    ``x``: (K, *batch, n) Montgomery digits; ``twiddles_br``: (K, n/2) in
    bit-reverse order (stage s uses its first 2^s entries, exactly like the
    reference's ``in_place_nr_2radix_fft``, ``math/src/fft/cpu/fft.rs:20`` —
    but vectorised over whole stages instead of per-butterfly loops).
    """
    K = x.shape[0]
    batch = x.shape[1:-1]
    n = x.shape[-1]
    stages = n.bit_length() - 1
    bshape = (1,) * len(batch)

    x = x.reshape((K,) + batch + (1, n))
    for s in range(stages):
        m = 1 << s
        g = x.shape[-1]
        half = g // 2
        a = x[..., :half]
        b = x[..., half:]
        w = twiddles_br[:, :m].reshape((K,) + bshape + (m, 1))
        wb = field.mul(w, b)
        x = jnp.concatenate([field.add(a, wb), field.sub(a, wb)], axis=-1)
        x = x.reshape((K,) + batch + (2 * m, half))
    return x.reshape((K,) + batch + (n,))


def fft(coeffs, field: PrimeField):
    """Forward transform: natural-order coefficients -> natural-order
    evaluations P(w^i) over the size-n domain (n = last-axis length, must be
    a power of two)."""
    n = coeffs.shape[-1]
    _check_pow2(n)
    order = n.bit_length() - 1
    if order > field.two_adicity:
        raise FFTError(
            f"{field.name}: order {order} exceeds two-adicity {field.two_adicity}"
        )
    return fft_with_root(coeffs, field,
                         field.params.primitive_root_of_unity(order))


def ifft(evals, field: PrimeField):
    """Inverse transform: natural-order evaluations -> coefficients."""
    n = evals.shape[-1]
    _check_pow2(n)
    order = n.bit_length() - 1
    if order > field.two_adicity:
        raise FFTError(
            f"{field.name}: order {order} exceeds two-adicity {field.two_adicity}"
        )
    root = field.params.primitive_root_of_unity(order)
    out = fft_with_root(evals, field, pow(root, field.p - 2, field.p))
    n_inv = field.constant(pow(n, field.p - 2, field.p), ())
    n_inv = n_inv.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return field.mul(out, jnp.broadcast_to(n_inv, out.shape))


# ---------------------------------------------------------------------------
# polynomial-level API (reference parity)
# ---------------------------------------------------------------------------

def evaluate_fft(field: PrimeField, coeffs, blowup_factor: int = 1,
                 domain_size: int | None = None):
    """Pad to next_power_of_two(max(len, domain_size)) * blowup and evaluate
    (``Polynomial::evaluate_fft``, ``math/src/fft/polynomial.rs:25``)."""
    padded = _pad_coeffs(field, coeffs, blowup_factor, domain_size)
    return fft(padded, field)


def evaluate_offset_fft(field: PrimeField, coeffs, blowup_factor: int = 1,
                        domain_size: int | None = None, offset: int = 1):
    """Evaluations over the coset offset*<w> (``fft/polynomial.rs:74``)."""
    scaled = scale_coeffs(field, coeffs, offset)
    return evaluate_fft(field, scaled, blowup_factor, domain_size)


def interpolate_fft(field: PrimeField, evals):
    """Coefficients of the polynomial interpolating (w^i, evals[i])
    (``fft/polynomial.rs:87``)."""
    return ifft(evals, field)


def interpolate_offset_fft(field: PrimeField, evals, offset: int):
    """Inverse of evaluate_offset_fft (``fft/polynomial.rs:121``)."""
    coeffs = ifft(evals, field)
    inv_off = pow(int(offset), field.p - 2, field.p)
    return scale_coeffs(field, coeffs, inv_off)


def compose_fft(field: PrimeField, poly_1, poly_2):
    """Composition p1(p2(x)) via evaluation (``compose_fft``,
    ``math/src/fft/polynomial.rs:130``): evaluate p2 over a domain large
    enough for the composition, Horner-evaluate p1 at those values,
    interpolate back.  Host polynomials in, host polynomial out."""
    from .polynomial import Polynomial

    deg = max(poly_1.degree(), 0) * max(poly_2.degree(), 1) + 1
    size = 1 << max((deg - 1).bit_length(), 0)
    evals2 = field.to_ints(evaluate_fft(field, poly_2.to_device(size)))
    values = [poly_1.evaluate(field(int(v))) for v in evals2]
    coeffs = interpolate_fft(field, field.array([v.value for v in values]))
    return Polynomial(field, [int(v) for v in field.to_ints(coeffs)])


def scale_coeffs(field: PrimeField, coeffs, factor: int):
    """coeffs[i] *= factor^i (``Polynomial::scale``, ``polynomial/mod.rs:259``)."""
    factor = int(factor) % field.p
    if factor == 1:
        return coeffs
    n = coeffs.shape[-1]
    pows = powers(field, factor, n)
    pows = pows.reshape(
        (coeffs.shape[0],) + (1,) * (coeffs.ndim - 2) + (n,)
    )
    return field.mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))


def _pad_coeffs(field, coeffs, blowup_factor, domain_size):
    n = coeffs.shape[-1]
    target = max(n, domain_size or 0)
    target = 1 << (target - 1).bit_length() if target > 1 else 1
    target *= blowup_factor
    if target < n:
        raise FFTError("domain smaller than polynomial")
    if target == n:
        return coeffs
    pad = [(0, 0)] * coeffs.ndim
    pad[-1] = (0, target - n)
    return jnp.pad(coeffs, pad)


def _check_pow2(n):
    if n & (n - 1) or n == 0:
        raise FFTError(f"size {n} is not a power of two")
