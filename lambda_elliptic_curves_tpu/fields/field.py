"""Field façade: one object per prime field bundling the host (exact int)
path and the device (batched digit-kernel) path.

TPU-native counterpart of ``FieldElement<F>`` + the Montgomery backend
(``math/src/field/element.rs:40``,
``math/src/field/fields/montgomery_backed_prime_fields.rs:114``): on device
there are no element objects, only ``(K, *batch)`` uint32 digit arrays in the
Montgomery domain, and the ``PrimeField`` object is the kernel dispatcher.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .params import FieldParams
from .element import FieldElement
from ..ops import limbs


class PrimeField:
    """A prime field F_p with batched TPU arithmetic.

    Device representation: ``(K, *batch)`` uint32 arrays of 16-bit digits in
    Montgomery form (x*R mod p).  Host representation: Python ints via
    :class:`FieldElement`.
    """

    def __init__(self, params: FieldParams):
        self.params = params

    # -- identity ---------------------------------------------------------
    @property
    def name(self):
        return self.params.name

    @property
    def p(self):
        return self.params.p

    @property
    def num_digits(self):
        return self.params.num_digits

    def __repr__(self):
        return f"PrimeField({self.params.name})"

    def __eq__(self, other):
        return isinstance(other, PrimeField) and other.params.p == self.params.p

    def __hash__(self):
        return hash((self.params.name, self.params.p))

    # -- host elements ------------------------------------------------------
    def __call__(self, value) -> FieldElement:
        """Construct a host element from int / hex string / FieldElement."""
        if isinstance(value, FieldElement):
            if value.field is not self and value.field.p != self.p:
                raise ValueError("element from a different field")
            return FieldElement(self, value.value)
        if isinstance(value, str):
            value = int(value, 16)
        return FieldElement(self, int(value) % self.params.p)

    def zero(self) -> FieldElement:
        return FieldElement(self, 0)

    def one(self) -> FieldElement:
        return FieldElement(self, 1)

    def from_hex(self, s: str) -> FieldElement:
        return self(int(s.removeprefix("0x"), 16))

    # host-level ops used by FieldElement
    host_add = property(lambda self: self.params.add)
    host_sub = property(lambda self: self.params.sub)
    host_mul = property(lambda self: self.params.mul)
    host_neg = property(lambda self: self.params.neg)
    host_inv = property(lambda self: self.params.inv)
    host_pow = property(lambda self: self.params.pow)

    # -- device constructors ------------------------------------------------
    def array(self, values) -> jnp.ndarray:
        """Host values (ints / FieldElements, nested lists ok) to a device
        digit array in Montgomery form."""
        vals = _as_int_array(values)
        canon = limbs.ints_to_digits_np(vals, self.params)
        return self._jit_to_mont(jnp.asarray(canon))

    def to_ints(self, arr) -> np.ndarray:
        """Device Montgomery digit array -> object ndarray of Python ints."""
        canon = self._jit_from_mont(arr)
        return limbs.digits_to_ints_np(canon, self.params)

    def to_elements(self, arr):
        flat = self.to_ints(arr)
        return [FieldElement(self, int(v)) for v in np.ravel(flat)]

    def constant(self, value, batch_shape=()) -> jnp.ndarray:
        """Montgomery-form constant broadcast over a batch shape."""
        if isinstance(value, FieldElement):
            value = value.value
        mont = (int(value) * self.params.r) % self.params.p
        return limbs.const_digits(mont, self.params, batch_shape)

    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros((self.params.num_digits,) + tuple(batch_shape), jnp.uint32)

    def ones(self, batch_shape=()) -> jnp.ndarray:
        return self.constant(1, batch_shape)

    # -- device arithmetic ----------------------------------------------------
    # Each op is wrapped in a cached jax.jit so eager callers pay one
    # compile per shape and a single dispatch per call (the digit kernels
    # expand to a few hundred XLA ops that would otherwise dispatch one by
    # one in eager mode).  Under an outer jit these wrappers are inlined.

    @functools.cached_property
    def _jit_add(self):
        return jax.jit(lambda a, b: limbs.add(a, b, self.params))

    @functools.cached_property
    def _jit_sub(self):
        return jax.jit(lambda a, b: limbs.sub(a, b, self.params))

    @functools.cached_property
    def _jit_neg(self):
        return jax.jit(lambda a: limbs.neg(a, self.params))

    @functools.cached_property
    def _jit_mul(self):
        return jax.jit(lambda a, b: limbs.mont_mul(a, b, self.params))

    @functools.cached_property
    def _jit_square(self):
        return jax.jit(lambda a: limbs.mont_square(a, self.params))

    @functools.cached_property
    def _jit_inv(self):
        return jax.jit(lambda a: limbs.mont_inv(a, self.params))

    @functools.cached_property
    def _jit_batch_inverse(self):
        return jax.jit(lambda a: limbs.batch_inverse(a, self.params))

    @functools.cached_property
    def _jit_to_mont(self):
        return jax.jit(lambda a: limbs.to_mont(a, self.params))

    @functools.cached_property
    def _jit_from_mont(self):
        return jax.jit(lambda a: limbs.from_mont(a, self.params))

    @functools.cached_property
    def _jit_pow(self):
        @functools.lru_cache(maxsize=64)
        def make(exponent):
            return jax.jit(
                lambda a: limbs.mont_pow(a, exponent, self.params)
            )

        return make

    def add(self, a, b):
        return self._jit_add(a, b)

    def sub(self, a, b):
        return self._jit_sub(a, b)

    def neg(self, a):
        return self._jit_neg(a)

    def mul(self, a, b):
        return self._jit_mul(a, b)

    def square(self, a):
        return self._jit_square(a)

    def pow(self, a, exponent: int):
        return self._jit_pow(int(exponent))(a)

    def inv(self, a):
        return self._jit_inv(a)

    def batch_inverse(self, a):
        return self._jit_batch_inverse(a)

    def is_zero(self, a):
        return limbs.is_zero(a)

    def equal(self, a, b):
        return limbs.equal(a, b)

    def select(self, cond, a, b):
        return limbs.select(cond, a, b)

    # -- FFT data -------------------------------------------------------------
    @property
    def two_adicity(self):
        return self.params.two_adicity

    def primitive_root_of_unity(self, order: int) -> FieldElement:
        return FieldElement(self, self.params.primitive_root_of_unity(order))


def _as_int_array(values):
    """Normalize nested lists of ints/FieldElements to an object ndarray."""
    def conv(v):
        if isinstance(v, FieldElement):
            return v.value
        return int(v)

    arr = np.asarray(values, dtype=object)
    return np.vectorize(conv, otypes=[object])(arr) if arr.size else arr
