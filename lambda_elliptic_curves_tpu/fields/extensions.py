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
# device (batched) quadratic extension — flat digit layout
# ---------------------------------------------------------------------------

class DeviceQuadraticField:
    """Batched quadratic extension E = B[u]/(u^2 - non_residue) over a
    device base field B (a :class:`PrimeField` or, nested, another
    ``DeviceQuadraticField`` — giving Fp4 towers).

    **Flat layout**: an element batch is a single ``(2*Kb, *batch)`` uint32
    array — component 0's digits stacked on top of component 1's.  Because
    the layout keeps axis 0 as "the digits" and everything else as batch,
    every consumer written against the ``PrimeField`` device API (the
    Jacobian group law, MSM bucket pipelines, select/is_zero generic code)
    works unchanged over extension elements.

    Parity: ``QuadraticExtensionField`` (``math/src/field/extensions/
    quadratic.rs:12``) as a *data layout + kernel set* instead of a trait.
    """

    def __init__(self, base, non_residue, name=None):
        self.base = base
        # non_residue: int for prime base, tuple for nested base
        if isinstance(base, DeviceQuadraticField):
            self.non_residue = non_residue
        else:
            self.non_residue = int(non_residue) % base.p
        self.name = name or f"{base.name}_x2"
        self.p = base.p  # characteristic (prime of the bottom field)

    @property
    def num_digits(self):
        return 2 * self.base.num_digits

    @property
    def degree_over_prime(self):
        return 2 * getattr(self.base, "degree_over_prime", 1)

    # -- layout helpers -----------------------------------------------------
    def split(self, a):
        k = self.base.num_digits
        return a[:k], a[k:]

    @staticmethod
    def join(c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    # -- host <-> device ----------------------------------------------------
    def _components(self, value):
        """Normalize an int / tuple / FieldElement to a component pair."""
        if isinstance(value, FieldElement):
            value = value.value
        if isinstance(value, tuple):
            return value[0], value[1]
        return value, 0 if not isinstance(self.base, DeviceQuadraticField) \
            else self._zero_component()

    def _zero_component(self):
        b = self.base
        if isinstance(b, DeviceQuadraticField):
            z = b._zero_component()
            return (z, z)
        return 0

    def array(self, values):
        """List of tuples (recursively nested for towers) / ints /
        host FieldElements -> (2*Kb, B) device array."""
        pairs = [self._components(v) for v in values]
        c0 = self.base.array([p[0] for p in pairs])
        c1 = self.base.array([p[1] for p in pairs])
        return self.join(c0, c1)

    def to_tuples(self, arr):
        """Device array -> list of component tuples (ints at the leaves)."""
        c0, c1 = self.split(arr)
        if isinstance(self.base, DeviceQuadraticField):
            lo = self.base.to_tuples(c0)
            hi = self.base.to_tuples(c1)
        else:
            lo = [int(v) for v in self.base.to_ints(c0).ravel()]
            hi = [int(v) for v in self.base.to_ints(c1).ravel()]
        return list(zip(lo, hi))

    def constant(self, value, batch_shape=()):
        v0, v1 = self._components(value)
        return self.join(self.base.constant(v0, batch_shape),
                         self.base.constant(v1, batch_shape))

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.num_digits,) + tuple(batch_shape), jnp.uint32)

    def ones(self, batch_shape=()):
        return self.join(self.base.ones(batch_shape),
                         self.base.zeros(batch_shape))

    def embed(self, base_arr):
        """Lift a base-field array (Kb, *batch) into the extension."""
        return self.join(base_arr, jnp.zeros_like(base_arr))

    # -- arithmetic ---------------------------------------------------------
    def add(self, a, b):
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        return self.join(self.base.add(a0, b0), self.base.add(a1, b1))

    def sub(self, a, b):
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        return self.join(self.base.sub(a0, b0), self.base.sub(a1, b1))

    def neg(self, a):
        a0, a1 = self.split(a)
        return self.join(self.base.neg(a0), self.base.neg(a1))

    def mul(self, a, b):
        f = self.base
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        mid = f.mul(f.add(a0, a1), f.add(b0, b1))
        mid = f.sub(f.sub(mid, t0), t1)
        return self.join(f.add(t0, self._mul_res(t1)), mid)

    def _mul_res(self, v):
        r = self.non_residue
        f = self.base
        if not isinstance(f, DeviceQuadraticField) and r == f.p - 1:
            return f.neg(v)
        return f.mul(f.constant(r, v.shape[1:]), v)

    def square(self, a):
        return self.mul(a, a)

    def inv(self, a):
        f = self.base
        a0, a1 = self.split(a)
        norm = f.sub(f.mul(a0, a0), self._mul_res(f.mul(a1, a1)))
        ninv = f.inv(norm)
        return self.join(f.mul(a0, ninv), f.mul(f.neg(a1), ninv))

    def batch_inverse(self, a):
        f = self.base
        a0, a1 = self.split(a)
        norm = f.sub(f.mul(a0, a0), self._mul_res(f.mul(a1, a1)))
        ninv = f.batch_inverse(norm)
        return self.join(f.mul(a0, ninv), f.mul(f.neg(a1), ninv))

    def is_zero(self, a):
        a0, a1 = self.split(a)
        return self.base.is_zero(a0) & self.base.is_zero(a1)

    def equal(self, a, b):
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        return self.base.equal(a0, b0) & self.base.equal(a1, b1)

    def select(self, cond, a, b):
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        return self.join(self.base.select(cond, a0, b0),
                         self.base.select(cond, a1, b1))

    def pow(self, a, e: int):
        batch = a.shape[1:]
        e = int(e)
        result = None
        acc = a
        while e:
            if e & 1:
                result = acc if result is None else self.mul(result, acc)
            e >>= 1
            if e:
                acc = self.square(acc)
        return self.ones(batch) if result is None else result
