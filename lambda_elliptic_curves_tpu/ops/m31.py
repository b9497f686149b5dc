"""Single-word Mersenne31 vector arithmetic (p = 2^31 - 1).

Parity role: the reference's u32 fast-path fields
(``math/src/field/fields/mersenne31/field.rs``, and the spirit of
``u32_montgomery_backend_prime_field.rs``): small fields are the TPU
sweet spot, so Mersenne31 elements live in ONE uint32 lane each — no
digit axis — and every op is a handful of VPU instructions.

Reduction exploits 2^31 ≡ 1 (mod p): fold(x) = (x & p) + (x >> 31).
Products use 16-bit operand splits (u32 lane multiplies are exact for
16x16) and the congruences 2^31 ≡ 1, 2^32 ≡ 2.

Values are canonical in [0, p).  Arrays are plain ``(...,)`` uint32 —
used by the device circle FFT (``circle/cfft_device.py``) and anything
else Mersenne31-hot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
P = 0x7FFFFFFF  # 2^31 - 1
_P = U32(P)
_M16 = U32(0xFFFF)
_M15 = U32(0x7FFF)


def _fold(x):
    """x (< 2^32) -> congruent value < 2^31 + 1."""
    return (x & _P) + (x >> U32(31))


def _canon(x):
    """x < 2^32 -> canonical representative in [0, p)."""
    x = _fold(x)          # < 2^31 + 1
    x = _fold(x)          # <= 2^31 -> value p maps to p
    return jnp.where(x == _P, U32(0), x)


def add(a, b):
    return _canon(a + b)


def sub(a, b):
    return _canon(a + (_P - b))


def neg(a):
    return jnp.where(a == 0, a, _P - a)


def mul(a, b):
    """a*b mod p via 16-bit operand splits.

    a*b = ll + (lh + hl)*2^16 + hh*2^32 with each part < 2^32;
    x*2^16 ≡ ((x & 0x7fff) << 16) + (x >> 15)   (2^31 ≡ 1)
    hh*2^32 ≡ 2*hh                               (2^32 ≡ 2)
    """
    a0 = a & _M16
    a1 = a >> U32(16)
    b0 = b & _M16
    b1 = b >> U32(16)
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    m16 = lambda x: ((x & _M15) << U32(16)) + (x >> U32(15))
    h2 = ((hh & U32(0x3FFFFFFF)) << U32(1)) + (hh >> U32(30))
    acc = _fold(_fold(ll) + m16(lh))
    acc2 = _fold(m16(hl) + h2)
    return _canon(acc + acc2)


def square(a):
    return mul(a, a)


def pow_static(a, exponent: int):
    """Static-exponent power (square-and-multiply, unrolled)."""
    result = None
    base = a
    e = int(exponent)
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    if result is None:
        return jnp.ones_like(a)
    return result


def inv(a):
    """Fermat inverse a^(p-2); maps 0 to 0."""
    return pow_static(a, P - 2)


def batch_inverse(a):
    """Montgomery-trick inversion along the last axis; zeros map to zero."""
    zmask = a == 0
    safe = jnp.where(zmask, U32(1), a)
    prefix = jax.lax.associative_scan(mul, safe, axis=-1)
    suffix = jnp.flip(
        jax.lax.associative_scan(mul, jnp.flip(safe, axis=-1), axis=-1),
        axis=-1,
    )
    total_inv = inv(prefix[..., -1])
    ones = jnp.ones_like(a[..., :1])
    left = jnp.concatenate([ones, prefix[..., :-1]], axis=-1)
    right = jnp.concatenate([suffix[..., 1:], ones], axis=-1)
    out = mul(mul(left, right), total_inv[..., None])
    return jnp.where(zmask, U32(0), out)
