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
# device (batched) extensions — flat digit layout
# ---------------------------------------------------------------------------

class _DeviceExtension:
    """Shared layout machinery for flat-digit device extensions: an element
    batch of a degree-d extension over base B is one (d*Kb, *batch) uint32
    array, component 0's digits first.  Axis 0 stays "the digits", so any
    consumer written against the ``PrimeField`` device API (Jacobian group
    law, MSM pipelines, generic select/is_zero code) works unchanged."""

    degree: int = 0

    def split(self, a):
        k = self.base.num_digits
        return tuple(a[i * k:(i + 1) * k] for i in range(self.degree))

    @staticmethod
    def join(*comps):
        return jnp.concatenate(comps, axis=0)

    @property
    def num_digits(self):
        return self.degree * self.base.num_digits

    @property
    def degree_over_prime(self):
        return self.degree * getattr(self.base, "degree_over_prime", 1)

    # -- host <-> device ----------------------------------------------------
    def _components(self, value):
        """Normalize an int / tuple / FieldElement to a component tuple."""
        if isinstance(value, FieldElement):
            value = value.value
        if isinstance(value, tuple) and len(value) == self.degree:
            return value
        z = self._zero_component()
        return (value,) + (z,) * (self.degree - 1)

    def _zero_component(self):
        b = self.base
        if isinstance(b, _DeviceExtension):
            return b._components(0)
        return 0

    def array(self, values):
        """List of (recursively nested) tuples / ints / host FieldElements
        -> (d*Kb, B) device array."""
        groups = [self._components(v) for v in values]
        return self.join(*(self.base.array([g[i] for g in groups])
                           for i in range(self.degree)))

    def to_tuples(self, arr):
        """Device array -> list of component tuples (ints at the leaves)."""
        comps = self.split(arr)
        if isinstance(self.base, _DeviceExtension):
            cols = [self.base.to_tuples(c) for c in comps]
        else:
            cols = [[int(v) for v in self.base.to_ints(c).ravel()]
                    for c in comps]
        return list(zip(*cols))

    def constant(self, value, batch_shape=()):
        comps = self._components(value)
        return self.join(*(self.base.constant(c, batch_shape)
                           for c in comps))

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.num_digits,) + tuple(batch_shape), jnp.uint32)

    def ones(self, batch_shape=()):
        return self.join(self.base.ones(batch_shape),
                         *([self.base.zeros(batch_shape)]
                           * (self.degree - 1)))

    def embed(self, base_arr):
        """Lift a base-field array (Kb, *batch) into the extension."""
        pad = jnp.zeros(((self.degree - 1) * base_arr.shape[0],)
                        + base_arr.shape[1:], base_arr.dtype)
        return jnp.concatenate([base_arr, pad], axis=0)

    # -- componentwise ops ----------------------------------------------------
    def add(self, a, b):
        return self.join(*(self.base.add(x, y)
                           for x, y in zip(self.split(a), self.split(b))))

    def sub(self, a, b):
        return self.join(*(self.base.sub(x, y)
                           for x, y in zip(self.split(a), self.split(b))))

    def neg(self, a):
        return self.join(*(self.base.neg(x) for x in self.split(a)))

    def square(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        comps = self.split(a)
        out = self.base.is_zero(comps[0])
        for c in comps[1:]:
            out = out & self.base.is_zero(c)
        return out

    def equal(self, a, b):
        out = None
        for x, y in zip(self.split(a), self.split(b)):
            e = self.base.equal(x, y)
            out = e if out is None else (out & e)
        return out

    def select(self, cond, a, b):
        return self.join(*(self.base.select(cond, x, y)
                           for x, y in zip(self.split(a), self.split(b))))

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

    def _mul_res(self, v):
        """Multiply a base-field value by this extension's non-residue."""
        r = self.non_residue
        f = self.base
        if not isinstance(f, _DeviceExtension) and r == f.p - 1:
            return f.neg(v)
        if isinstance(f, DeviceCubicField) and r == f.generator_tuple():
            return f.mul_by_gen(v)
        return f.mul(f.constant(r, v.shape[1:]), v)


class DeviceQuadraticField(_DeviceExtension):
    """Batched quadratic extension E = B[u]/(u^2 - non_residue) over a
    device base field B (a :class:`PrimeField`, another
    ``DeviceQuadraticField`` — Fp4 towers — or a :class:`DeviceCubicField`,
    giving the (2,3,2) pairing towers Fp12 = Fp6[w]/(w^2 - v)).

    Parity: ``QuadraticExtensionField`` (``math/src/field/extensions/
    quadratic.rs:12``) as a *data layout + kernel set* instead of a trait.
    """

    degree = 2

    def __init__(self, base, non_residue, name=None):
        self.base = base
        # non_residue: int for prime base, tuple for nested base
        if isinstance(base, _DeviceExtension):
            self.non_residue = non_residue
        else:
            self.non_residue = int(non_residue) % base.p
        self.name = name or f"{base.name}_x2"
        self.p = base.p  # characteristic (prime of the bottom field)

    def mul(self, a, b):
        f = self.base
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        mid = f.mul(f.add(a0, a1), f.add(b0, b1))
        mid = f.sub(f.sub(mid, t0), t1)
        return self.join(f.add(t0, self._mul_res(t1)), mid)

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

    def conjugate(self, a):
        a0, a1 = self.split(a)
        return self.join(a0, self.base.neg(a1))


class DeviceCubicField(_DeviceExtension):
    """Batched cubic extension E = B[v]/(v^3 - non_residue) over a device
    base field B — composes with :class:`DeviceQuadraticField` into the
    pairing towers (Fp6 = Fp2[v]/(v^3 - xi)).

    Parity: ``CubicExtensionField`` (``math/src/field/extensions/
    cubic.rs:12``) and the concrete Fp6 modules
    (``curves/bls12_381/field_extension.rs:23``).
    """

    degree = 3

    def __init__(self, base, non_residue, name=None):
        self.base = base
        if isinstance(base, _DeviceExtension):
            self.non_residue = non_residue
        else:
            self.non_residue = int(non_residue) % base.p
        self.name = name or f"{base.name}_x3"
        self.p = base.p

    def generator_tuple(self):
        """The element v of this field as a component tuple (for w^2 = v
        tower detection in :meth:`_DeviceExtension._mul_res`)."""
        if isinstance(self.base, _DeviceExtension):
            return (self.base._components(0), self.base._components(1),
                    self.base._components(0))
        return (0, 1, 0)

    def mul_by_gen(self, a):
        """v * (c0 + c1 v + c2 v^2) = r*c2 + c0 v + c1 v^2  (the sparse
        ``f6_mul_by_v`` of the host tower)."""
        c0, c1, c2 = self.split(a)
        return self.join(self._mul_res(c2), c0, c1)

    def mul(self, a, b):
        """Toom/Karatsuba-style 6-mul cubic product (CH-SQR3 form, same
        formulas as the host ``ExtensionField.host_mul`` /
        ``Tower.f6_mul``)."""
        f = self.base
        a0, a1, a2 = self.split(a)
        b0, b1, b2 = self.split(b)
        v0 = f.mul(a0, b0)
        v1 = f.mul(a1, b1)
        v2 = f.mul(a2, b2)
        c0 = f.add(v0, self._mul_res(f.sub(f.sub(
            f.mul(f.add(a1, a2), f.add(b1, b2)), v1), v2)))
        c1 = f.add(f.sub(f.sub(
            f.mul(f.add(a0, a1), f.add(b0, b1)), v0), v1),
            self._mul_res(v2))
        c2 = f.add(f.sub(f.sub(
            f.mul(f.add(a0, a2), f.add(b0, b2)), v0), v2), v1)
        return self.join(c0, c1, c2)

    def inv(self, a):
        f = self.base
        a0, a1, a2 = self.split(a)
        t0 = f.sub(f.mul(a0, a0), self._mul_res(f.mul(a1, a2)))
        t1 = f.sub(self._mul_res(f.mul(a2, a2)), f.mul(a0, a1))
        t2 = f.sub(f.mul(a1, a1), f.mul(a0, a2))
        norm = f.add(f.mul(a0, t0),
                     self._mul_res(f.add(f.mul(a2, t1), f.mul(a1, t2))))
        ninv = f.inv(norm)
        return self.join(f.mul(t0, ninv), f.mul(t1, ninv), f.mul(t2, ninv))

    def batch_inverse(self, a):
        f = self.base
        a0, a1, a2 = self.split(a)
        t0 = f.sub(f.mul(a0, a0), self._mul_res(f.mul(a1, a2)))
        t1 = f.sub(self._mul_res(f.mul(a2, a2)), f.mul(a0, a1))
        t2 = f.sub(f.mul(a1, a1), f.mul(a0, a2))
        norm = f.add(f.mul(a0, t0),
                     self._mul_res(f.add(f.mul(a2, t1), f.mul(a1, t2))))
        ninv = f.batch_inverse(norm)
        return self.join(f.mul(t0, ninv), f.mul(t1, ninv), f.mul(t2, ninv))
