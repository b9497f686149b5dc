"""Dense univariate polynomials.

Parity: ``Polynomial<FE>`` (``math/src/polynomial/mod.rs:13``) — Lagrange
``interpolate`` (:46), Horner ``evaluate`` (:98), ``ruffini_division``
(:157), ``long_division_with_remainder`` (:188), ``xgcd`` (:213),
``mul_with_ref`` (:243), ``scale`` (:259), ``break_in_parts`` (:289).

Architecture note: this class is the *host* (exact-int) path used for
protocol-sized polynomials — quotients at single points, vanishing-poly
algebra, test oracles.  Bulk polynomial work (LDEs, compositions, folds)
never materialises element objects; it stays in digit-major device arrays
and flows through ``poly.ntt`` and the device helpers at the bottom of this
module.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.element import FieldElement
from ..utils.errors import FieldError


class Polynomial:
    """Coefficient-form polynomial over host field elements.

    ``coefficients[i]`` multiplies x^i.  Trailing zeros are trimmed so
    ``degree`` is well-defined; the zero polynomial has degree -1.
    """

    __slots__ = ("field", "coefficients")

    def __init__(self, field, coefficients):
        self.field = field
        coeffs = [field(c) if not isinstance(c, FieldElement) else c
                  for c in coefficients]
        while coeffs and coeffs[-1].is_zero():
            coeffs.pop()
        self.coefficients = coeffs

    # -- constructors ------------------------------------------------------
    @classmethod
    def zero(cls, field):
        return cls(field, [])

    @classmethod
    def new_monomial(cls, coefficient, degree: int):
        field = coefficient.field
        return cls(field, [field.zero()] * degree + [coefficient])

    @classmethod
    def interpolate(cls, xs, ys):
        """Lagrange interpolation (``polynomial/mod.rs:46``)."""
        if len(xs) != len(ys):
            raise FieldError("xs and ys must have equal length")
        if not xs:
            return None
        field = xs[0].field
        result = cls.zero(field)
        for i, (xi, yi) in enumerate(zip(xs, ys)):
            num = cls(field, [field.one()])
            den = field.one()
            for j, xj in enumerate(xs):
                if i == j:
                    continue
                num = num * cls(field, [-xj, field.one()])
                den = den * (xi - xj)
            result = result + num * (yi * den.inv())
        return result

    # -- basic queries -------------------------------------------------------
    def degree(self) -> int:
        return len(self.coefficients) - 1

    def coeff_len(self) -> int:
        return len(self.coefficients)

    def leading_coefficient(self):
        return self.coefficients[-1] if self.coefficients else self.field.zero()

    def is_zero(self) -> bool:
        return not self.coefficients

    def __eq__(self, other):
        return (
            isinstance(other, Polynomial)
            and self.coefficients == other.coefficients
        )

    def __repr__(self):
        return f"Polynomial({[c.to_hex() for c in self.coefficients]})"

    # -- evaluation ------------------------------------------------------------
    def evaluate(self, x):
        """Horner evaluation (``polynomial/mod.rs:98``)."""
        acc = self.field.zero()
        for c in reversed(self.coefficients):
            acc = acc * x + c
        return acc

    def evaluate_slice(self, xs):
        return [self.evaluate(x) for x in xs]

    # -- ring ops ----------------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, (FieldElement, int)):
            other = Polynomial(self.field, [self.field(other)])
        n = max(len(self.coefficients), len(other.coefficients))
        z = self.field.zero()
        a = self.coefficients + [z] * (n - len(self.coefficients))
        b = other.coefficients + [z] * (n - len(other.coefficients))
        return Polynomial(self.field, [x + y for x, y in zip(a, b)])

    def __sub__(self, other):
        return self + (-other)

    def __neg__(self):
        return Polynomial(self.field, [-c for c in self.coefficients])

    def __mul__(self, other):
        if isinstance(other, (FieldElement, int)):
            other = self.field(other) if isinstance(other, int) else other
            return Polynomial(self.field, [c * other for c in self.coefficients])
        if self.is_zero() or other.is_zero():
            return Polynomial.zero(self.field)
        z = self.field.zero()
        out = [z] * (len(self.coefficients) + len(other.coefficients) - 1)
        for i, a in enumerate(self.coefficients):
            for j, b in enumerate(other.coefficients):
                out[i + j] = out[i + j] + a * b
        return Polynomial(self.field, out)

    __rmul__ = __mul__

    # -- division ------------------------------------------------------------------
    def long_division_with_remainder(self, divisor):
        """(quotient, remainder) (``polynomial/mod.rs:188``)."""
        if divisor.is_zero():
            raise ZeroDivisionError("polynomial division by zero")
        field = self.field
        rem = list(self.coefficients)
        dlead = divisor.leading_coefficient().inv()
        dd = divisor.degree()
        quo = [field.zero()] * max(len(rem) - dd, 0)
        while len(rem) - 1 >= dd and any(not c.is_zero() for c in rem):
            shift = len(rem) - 1 - dd
            coef = rem[-1] * dlead
            quo[shift] = quo[shift] + coef
            for i, dc in enumerate(divisor.coefficients):
                rem[shift + i] = rem[shift + i] - coef * dc
            while rem and rem[-1].is_zero():
                rem.pop()
        return Polynomial(field, quo), Polynomial(field, rem)

    def __truediv__(self, other):
        q, r = self.long_division_with_remainder(other)
        if not r.is_zero():
            raise FieldError("polynomial division with nonzero remainder")
        return q

    def ruffini_division(self, b):
        """Divide by (x - b) via synthetic division (``polynomial/mod.rs:157``).
        Assumes (x-b) divides self (as in quotienting at an opening point)."""
        if self.is_zero():
            return Polynomial.zero(self.field)
        out = []
        acc = self.field.zero()
        for c in reversed(self.coefficients):
            acc = acc * b + c
            out.append(acc)
        # out[-1] is the remainder; quotient is out[:-1] reversed
        return Polynomial(self.field, list(reversed(out[:-1])))

    def xgcd(self, other):
        """Extended Euclid: (g, s, t) with s*self + t*other = g, g monic
        (``polynomial/mod.rs:213``)."""
        field = self.field
        one = Polynomial(field, [field.one()])
        zero = Polynomial.zero(field)
        old_r, r = self, other
        old_s, s = one, zero
        old_t, t = zero, one
        while not r.is_zero():
            q, new_r = old_r.long_division_with_remainder(r)
            old_r, r = r, new_r
            old_s, s = s, old_s - q * s
            old_t, t = t, old_t - q * t
        lead_inv = old_r.leading_coefficient().inv() if not old_r.is_zero() else field.one()
        return old_r * lead_inv, old_s * lead_inv, old_t * lead_inv

    # -- structure ops -------------------------------------------------------------
    def scale(self, factor):
        """p(factor * x): coeff[i] *= factor^i (``polynomial/mod.rs:259``)."""
        acc = self.field.one()
        out = []
        for c in self.coefficients:
            out.append(c * acc)
            acc = acc * factor
        return Polynomial(self.field, out)

    def scale_coeffs(self, factor):
        return Polynomial(self.field, [c * factor for c in self.coefficients])

    def break_in_parts(self, number_of_parts: int):
        """Split p(x) = sum_i x^i p_i(x^k) into its k parts
        (``polynomial/mod.rs:289``)."""
        return [
            Polynomial(self.field, self.coefficients[i::number_of_parts])
            for i in range(number_of_parts)
        ]

    def reverse(self, degree: int):
        """Coefficient reversal to the given degree."""
        z = self.field.zero()
        coeffs = self.coefficients + [z] * (degree + 1 - len(self.coefficients))
        return Polynomial(self.field, list(reversed(coeffs[: degree + 1])))

    # -- device bridge -----------------------------------------------------------
    def to_device(self, length: int | None = None):
        """Coefficients as a Montgomery digit array (K, length)."""
        n = length or max(len(self.coefficients), 1)
        vals = [c.value for c in self.coefficients] + [0] * (n - len(self.coefficients))
        return self.field.array(vals)

    @classmethod
    def from_device(cls, field, arr):
        return cls(field, [field(int(v)) for v in field.to_ints(arr)])


# ---------------------------------------------------------------------------
# device-side helpers for bulk polynomial work
# ---------------------------------------------------------------------------

def field_sum(field, arr, axis=-1):
    """Modular sum along ``axis`` by log-depth halving (keeps every step a
    full-width vector add; jnp.sum cannot be used because reduction must be
    modular)."""
    arr = jnp.moveaxis(arr, axis if axis >= 0 else arr.ndim + axis, -1)
    n = arr.shape[-1]
    while n > 1:
        half = n // 2
        lo = arr[..., :half]
        hi = arr[..., half : 2 * half]
        s = field.add(lo, hi)
        if n % 2:
            s = jnp.concatenate([s, arr[..., -1:]], axis=-1)
        arr = s
        n = arr.shape[-1]
    return arr[..., 0]


def evaluate_coeffs_at(field, coeffs, point_int: int):
    """Evaluate a device coefficient array (K, ..., n) at a host point:
    dot(coeffs, powers(point)) with modular tree reduction."""
    from .ntt import powers

    n = coeffs.shape[-1]
    pows = powers(field, int(point_int) % field.p, n)
    pows = pows.reshape((coeffs.shape[0],) + (1,) * (coeffs.ndim - 2) + (n,))
    prods = field.mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))
    return field_sum(field, prods, axis=-1)
