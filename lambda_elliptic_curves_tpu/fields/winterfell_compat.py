"""Winterfell/Miden field compatibility (parity:
``math/src/field/fields/winterfell.rs`` — lambdaworks trait impls for
miden-core's ``Felt`` and ``QuadExtension<Felt>``).

The reference links the actual miden crates and re-exports their types;
here the compatibility surface is expressed over our own Goldilocks
backend:

* ``WinterfellFelt`` — miden's base field IS Goldilocks
  (p = 2^64 - 2^32 + 1).  Winterfell pins the two-adic root derived from
  the generator 7 (``winter_math::fields::f64``), which differs from the
  plonky2 root our :data:`..fields.zoo.Goldilocks` pins; NTT outputs match
  winterfell's exactly when the transform is run with
  :func:`winterfell_root_of_unity` through ``ntt.fft_with_root``.
* ``QuadFelt`` — miden's quadratic extension with defining polynomial
  x^2 - x - 1 (NOT a binomial, so the generic
  :class:`.extensions.ExtensionField` x^d = nr functor does not apply).
  Host-only: adapter glue and verifier math; bulk device work stays in the
  base field.
"""

from __future__ import annotations

from .element import FieldElement
from .zoo import Goldilocks

WinterfellFelt = Goldilocks

_P = Goldilocks.p
_WINTERFELL_GENERATOR = 7


def winterfell_root_of_unity(order: int) -> int:
    """The 2^order root winterfell derives from g = 7
    (``winter_math::fields::f64::BaseElement::TWO_ADIC_ROOT_OF_UNITY``
    convention: g^((p-1) / 2^32) then squared down)."""
    if order > 32:
        raise ValueError("Goldilocks two-adicity is 32")
    root = pow(_WINTERFELL_GENERATOR, (_P - 1) >> 32, _P)
    for _ in range(32 - order):
        root = root * root % _P
    return root


class _QuadFeltField:
    """Host field of miden's ``QuadExtension<Felt>``: elements a0 + a1*x
    with x^2 = x + 1.  Implements the ``host_*`` protocol
    :class:`..fields.element.FieldElement` dispatches to."""

    name = "winterfell_quadfelt"
    degree = 2

    @property
    def p(self):
        return _P

    def __repr__(self):
        return "QuadFelt"

    # -- construction -------------------------------------------------------
    def _coerce(self, value):
        if isinstance(value, FieldElement):
            value = value.value
        if isinstance(value, tuple):
            a0, a1 = value
            return (int(a0) % _P, int(a1) % _P)
        return (int(value) % _P, 0)

    def __call__(self, value) -> FieldElement:
        return FieldElement(self, self._coerce(value))

    def zero(self):
        return self((0, 0))

    def one(self):
        return self((1, 0))

    def x(self):
        """The adjoined root (miden: the 'phi' element)."""
        return self((0, 1))

    # -- host ops ------------------------------------------------------------
    def host_add(self, a, b):
        return ((a[0] + b[0]) % _P, (a[1] + b[1]) % _P)

    def host_sub(self, a, b):
        return ((a[0] - b[0]) % _P, (a[1] - b[1]) % _P)

    def host_neg(self, a):
        return ((-a[0]) % _P, (-a[1]) % _P)

    def host_mul(self, a, b):
        # (a0 + a1 x)(b0 + b1 x) with x^2 = x + 1:
        #   = a0 b0 + a1 b1  +  (a0 b1 + a1 b0 + a1 b1) x
        a0, a1 = a
        b0, b1 = b
        t = a1 * b1 % _P
        return ((a0 * b0 + t) % _P, (a0 * b1 + a1 * b0 + t) % _P)

    def host_inv(self, a):
        # conjugate under x -> 1 - x: (a0 + a1, -a1); norm is in F_p
        a0, a1 = a
        norm = (a0 * a0 + a0 * a1 - a1 * a1) % _P
        if norm == 0:
            raise ZeroDivisionError("inverse of zero in QuadFelt")
        ninv = pow(norm, _P - 2, _P)
        return ((a0 + a1) * ninv % _P, (-a1) * ninv % _P)

    def host_pow(self, a, e: int):
        e = int(e)
        if e < 0:
            a, e = self.host_inv(a), -e
        acc = (1, 0)
        while e:
            if e & 1:
                acc = self.host_mul(acc, a)
            a = self.host_mul(a, a)
            e >>= 1
        return acc


QuadFelt = _QuadFeltField()
