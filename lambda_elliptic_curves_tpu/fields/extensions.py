"""Field extensions: generic quadratic/cubic functors + tower construction.

Parity: ``QuadraticExtensionField`` / ``CubicExtensionField``
(``math/src/field/extensions/quadratic.rs:12``, ``cubic.rs:12``) and the
concrete towers (BLS12-381 Fp2/Fp6/Fp12 ``curves/bls12_381/
field_extension.rs``, BN254 tower, BabyBear quartic
``fft_friendly/quartic_babybear.rs``, Mersenne31 extensions
``mersenne31/extensions.rs``).

Host representation: an extension element is a tuple of base-field values
(recursively: ints at the leaves).  Device representation (quadratic only
for now): arrays of shape (D, K, *batch) — component-major on top of the
digit-major base layout, so every component op is a full-width base kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from .element import FieldElement
from .field import PrimeField
from ..utils.errors import ZeroInverseError


class ExtensionField:
    """Host extension field of degree 2 or 3 over ``base`` with defining
    polynomial x^degree = non_residue (non_residue lives in ``base``)."""

    def __init__(self, name, base, non_residue, degree):
        assert degree in (2, 3)
        self.name = name
        self.base = base
        self.non_residue = non_residue  # base-field value (int or tuple)
        self.degree = degree

    # -- identity ---------------------------------------------------------
    @property
    def p(self):
        return self.base.p

    def __repr__(self):
        return f"ExtensionField({self.name})"

    @property
    def extension_degree_over_prime(self):
        d = self.degree
        b = self.base
        while isinstance(b, ExtensionField):
            d *= b.degree
            b = b.base
        return d

    def prime_field(self) -> PrimeField:
        b = self.base
        while isinstance(b, ExtensionField):
            b = b.base
        return b

    # -- construction -------------------------------------------------------
    def __call__(self, value) -> FieldElement:
        return FieldElement(self, self._coerce(value))

    def _coerce(self, value):
        if isinstance(value, FieldElement):
            value = value.value
        if isinstance(value, tuple) and len(value) == self.degree:
            return tuple(self.base._coerce(v) if isinstance(self.base, ExtensionField)
                         else int(v) % self.base.p for v in value)
        # embed from the base (or from an int)
        zero = self.base._coerce(0) if isinstance(self.base, ExtensionField) else 0
        base_val = (self.base._coerce(value)
                    if isinstance(self.base, ExtensionField)
                    else int(value) % self.base.p)
        return (base_val,) + (zero,) * (self.degree - 1)

    def zero(self):
        return self(0)

    def one(self):
        return self(1)

    def from_components(self, comps):
        return FieldElement(self, tuple(
            c.value if isinstance(c, FieldElement) else self._base_coerce(c)
            for c in comps
        ))

    def _base_coerce(self, v):
        if isinstance(self.base, ExtensionField):
            return self.base._coerce(v)
        return int(v) % self.base.p

    # -- base ops used by FieldElement ---------------------------------------
    def _badd(self, a, b):
        return self.base.host_add(a, b)

    def _bsub(self, a, b):
        return self.base.host_sub(a, b)

    def _bmul(self, a, b):
        return self.base.host_mul(a, b)

    def _bneg(self, a):
        return self.base.host_neg(a)

    def _binv(self, a):
        return self.base.host_inv(a)

    def _bres(self, a):
        """multiply by the non-residue"""
        return self.base.host_mul(self.non_residue, a)

    def host_add(self, a, b):
        return tuple(self._badd(x, y) for x, y in zip(a, b))

    def host_sub(self, a, b):
        return tuple(self._bsub(x, y) for x, y in zip(a, b))

    def host_neg(self, a):
        return tuple(self._bneg(x) for x in a)

    def host_mul(self, a, b):
        if self.degree == 2:
            a0, a1 = a
            b0, b1 = b
            t0 = self._bmul(a0, b0)
            t1 = self._bmul(a1, b1)
            # (a0+a1)(b0+b1) - t0 - t1
            mid = self._bmul(self._badd(a0, a1), self._badd(b0, b1))
            mid = self._bsub(self._bsub(mid, t0), t1)
            return (self._badd(t0, self._bres(t1)), mid)
        a0, a1, a2 = a
        b0, b1, b2 = b
        v0 = self._bmul(a0, b0)
        v1 = self._bmul(a1, b1)
        v2 = self._bmul(a2, b2)
        c0 = self._badd(v0, self._bres(
            self._bsub(self._bsub(
                self._bmul(self._badd(a1, a2), self._badd(b1, b2)), v1), v2)))
        c1 = self._badd(
            self._bsub(self._bsub(
                self._bmul(self._badd(a0, a1), self._badd(b0, b1)), v0), v1),
            self._bres(v2))
        c2 = self._badd(
            self._bsub(self._bsub(
                self._bmul(self._badd(a0, a2), self._badd(b0, b2)), v0), v2),
            v1)
        return (c0, c1, c2)

    def host_inv(self, a):
        if all(self._is_bzero(x) for x in a):
            raise ZeroInverseError(f"inverse of zero in {self.name}")
        if self.degree == 2:
            a0, a1 = a
            # 1/(a0 + a1 x) = (a0 - a1 x) / (a0^2 - r a1^2)
            norm = self._bsub(self._bmul(a0, a0),
                              self._bres(self._bmul(a1, a1)))
            ninv = self._binv(norm)
            return (self._bmul(a0, ninv), self._bmul(self._bneg(a1), ninv))
        a0, a1, a2 = a
        r = self.non_residue
        t0 = self._bsub(self._bmul(a0, a0), self._bres(self._bmul(a1, a2)))
        t1 = self._bsub(self._bres(self._bmul(a2, a2)), self._bmul(a0, a1))
        t2 = self._bsub(self._bmul(a1, a1), self._bmul(a0, a2))
        norm = self._badd(
            self._bmul(a0, t0),
            self._bres(self._badd(self._bmul(a2, t1), self._bmul(a1, t2))),
        )
        ninv = self._binv(norm)
        return (self._bmul(t0, ninv), self._bmul(t1, ninv),
                self._bmul(t2, ninv))

    def host_pow(self, a, e: int):
        result = self._coerce(1)
        acc = a
        e = int(e)
        while e:
            if e & 1:
                result = self.host_mul(result, acc)
            acc = self.host_mul(acc, acc)
            e >>= 1
        return result

    def _is_bzero(self, x):
        if isinstance(x, tuple):
            return all(self._is_bzero(y) for y in x)
        return x == 0

    def conjugate(self, a):
        """Degree-2 conjugation a0 - a1 x."""
        assert self.degree == 2
        return (a[0], self._bneg(a[1]))


# ---------------------------------------------------------------------------
# device (batched) quadratic extension
# ---------------------------------------------------------------------------

class VectorQuadraticExtension:
    """Batched Fp2-style arithmetic: arrays are (2, K, *batch) with the
    component axis outermost; each component op is a full-width base-field
    kernel.  Mirrors the PrimeField device API so EC/NTT code is generic."""

    def __init__(self, base: PrimeField, non_residue: int, name=None):
        self.base = base
        self.non_residue = non_residue % base.p
        self.name = name or f"{base.name}_fp2"
        self.p = base.p  # order of the base prime (identity checks only)

    @property
    def num_digits(self):
        return self.base.num_digits

    def array(self, pairs):
        """[(c0, c1), ...] -> (2, K, B)."""
        c0 = self.base.array([p[0] for p in pairs])
        c1 = self.base.array([p[1] for p in pairs])
        return jnp.stack([c0, c1])

    def to_pairs(self, arr):
        c0 = self.base.to_ints(arr[0])
        c1 = self.base.to_ints(arr[1])
        return [(int(a), int(b)) for a, b in zip(c0.ravel(), c1.ravel())]

    def constant(self, pair, batch_shape=()):
        if isinstance(pair, int):
            pair = (pair, 0)
        return jnp.stack([
            self.base.constant(pair[0], batch_shape),
            self.base.constant(pair[1], batch_shape),
        ])

    def zeros(self, batch_shape=()):
        return jnp.stack([self.base.zeros(batch_shape)] * 2)

    def ones(self, batch_shape=()):
        return jnp.stack([self.base.ones(batch_shape),
                          self.base.zeros(batch_shape)])

    def add(self, a, b):
        return jnp.stack([self.base.add(a[0], b[0]), self.base.add(a[1], b[1])])

    def sub(self, a, b):
        return jnp.stack([self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1])])

    def neg(self, a):
        return jnp.stack([self.base.neg(a[0]), self.base.neg(a[1])])

    def mul(self, a, b):
        f = self.base
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        mid = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        mid = f.sub(f.sub(mid, t0), t1)
        return jnp.stack([f.add(t0, self._mul_res(t1)), mid])

    def _mul_res(self, v):
        r = self.non_residue
        f = self.base
        if r == f.p - 1:
            return f.neg(v)
        return f.mul(f.constant(r, v.shape[1:]), v)

    def square(self, a):
        return self.mul(a, a)

    def inv(self, a):
        f = self.base
        norm = f.sub(f.mul(a[0], a[0]), self._mul_res(f.mul(a[1], a[1])))
        ninv = f.inv(norm)
        return jnp.stack([f.mul(a[0], ninv), f.mul(f.neg(a[1]), ninv)])

    def batch_inverse(self, a):
        f = self.base
        norm = f.sub(f.mul(a[0], a[0]), self._mul_res(f.mul(a[1], a[1])))
        ninv = f.batch_inverse(norm)
        return jnp.stack([f.mul(a[0], ninv), f.mul(f.neg(a[1]), ninv)])

    def is_zero(self, a):
        return self.base.is_zero(a[0]) & self.base.is_zero(a[1])

    def equal(self, a, b):
        return self.base.equal(a[0], b[0]) & self.base.equal(a[1], b[1])

    def select(self, cond, a, b):
        return jnp.stack([self.base.select(cond, a[0], b[0]),
                          self.base.select(cond, a[1], b[1])])

    def pow(self, a, e: int):
        result = self.ones(a.shape[2:])
        acc = a
        e = int(e)
        first = True
        while e:
            if e & 1:
                result = acc if first else self.mul(result, acc)
                first = False
            e >>= 1
            if e:
                acc = self.square(acc)
        return result if not first else self.ones(a.shape[2:])
