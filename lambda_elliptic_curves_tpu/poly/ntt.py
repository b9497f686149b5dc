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
import jax.numpy as jnp

from ..fields.field import PrimeField
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


def powers(field: PrimeField, base_int: int, count: int, offset_int: int = 1):
    """Montgomery digit array (K, count) of offset * base^i, i in 0..count.

    Built by repeated doubling (concat [P, P * base^(2^j)]), so total device
    work is ~count multiplies issued as log(count) vector ops — the SPMD
    replacement for the reference's sequential successor scan
    (``roots_of_unity.rs:34``).
    """
    p = field.p
    acc = field.constant(offset_int % p, (1,))
    built = 1
    while built < count:
        step = field.constant(pow(base_int, built, p), (1,))
        nxt = field.mul(acc, step)
        acc = jnp.concatenate([acc, nxt], axis=-1)
        built *= 2
    return acc[..., :count]


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
    tw = get_twiddles(field, order, "bit_reverse")
    return bit_reverse_permute(_fft_core(coeffs, field, tw))


def ifft(evals, field: PrimeField):
    """Inverse transform: natural-order evaluations -> coefficients."""
    n = evals.shape[-1]
    _check_pow2(n)
    order = n.bit_length() - 1
    tw = get_twiddles(field, order, "bit_reverse_inversed")
    out = bit_reverse_permute(_fft_core(evals, field, tw))
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
