"""Challenge-field bundle: STARK protocol math over a field extension.

Parity: the reference AIR's ``Field: IsFFTField + IsSubFieldOf<FieldExtension>``
bound (``provers/stark/src/traits.rs:75-80``, ``math/src/field/traits.rs:18``)
— out-of-domain point z, DEEP coefficients and FRI folding challenges are
sampled in an extension E of the trace field F (``prover.rs:487``), which is
what makes small-field (BabyBear/Goldilocks/M31) STARKs sound: soundness
error scales with 1/|E|, not 1/|F|.

TPU-native design: E is a quadratic tower over F built from
:class:`DeviceQuadraticField` *flat* digit arrays — an E-element batch is a
``(D*K, *batch)`` uint32 array, so every device op the prover uses
(mul/add/batch_inverse/select) and the NTT (componentwise: the NTT is
F-linear, so an E-vector transforms component-by-component with base-field
twiddles) stay ordinary batched digit kernels.

For ``degree == 1`` every method degenerates to the base field exactly —
the prover/verifier keep one code path and the Stone byte-compatibility
tests keep passing untouched.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ...fields.element import FieldElement
from ...fields.extensions import DeviceQuadraticField, ExtensionField
from ...poly import ntt
from ...poly.polynomial import field_sum


@functools.cache
def _tower(field, degree: int):
    """(device_ext, host_ext) quadratic tower of the given degree over a
    PrimeField.  Level-1 non-residue: smallest positive non-square; higher
    levels use u (valid whenever -nr is a non-square, checked)."""
    assert degree in (2, 4)
    nr = 2
    while field.params.legendre(nr) != -1:
        nr += 1
    dev = DeviceQuadraticField(field, nr, name=f"{field.name}_fp2")
    host = ExtensionField(f"{field.name}_fp2", field, nr, 2)
    if degree == 2:
        return dev, host
    # u is a non-square in Fp2 iff its norm -nr is a non-square in Fp
    assert field.params.legendre(field.p - nr) == -1, (
        "tower non-residue u needs -nr to be a non-square; "
        "pick a different base non-residue for this field"
    )
    dev4 = DeviceQuadraticField(dev, (0, 1), name=f"{field.name}_fp4")
    host4 = ExtensionField(f"{field.name}_fp4", host, (0, 1), 2)
    return dev4, host4


def _flat_components(value, degree: int):
    """Nested component tuple (or int) -> flat list of D base ints,
    depth-first — matching the flat digit layout of the device arrays."""
    if degree == 1:
        return [int(value)]
    if not isinstance(value, tuple):
        return [int(value)] + [0] * (degree - 1)
    half = degree // 2
    return _flat_components(value[0], half) + _flat_components(value[1], half)


def _nest_components(flat, degree: int):
    """Flat list of D base ints -> nested tuple for the host tower."""
    if degree == 1:
        return flat[0]
    half = degree // 2
    return (_nest_components(flat[:half], half),
            _nest_components(flat[half:], half))


class ChallengeBundle:
    """The (F, E) pair the STARK protocol runs over.

    ``f``: base device PrimeField (trace field).  ``fd``: device challenge
    field (== ``f`` when degree 1, else a flat DeviceQuadraticField tower).
    ``host``: host constructor for challenge values (PrimeField or
    ExtensionField).
    """

    def __init__(self, field, degree: int = 1):
        self.f = field
        self.degree = degree
        if degree == 1:
            self.fd = field
            self.host = field
        else:
            self.fd, self.host = _tower(field, degree)

    # -- host/device element plumbing ---------------------------------------
    def value_of(self, elem):
        """FieldElement -> storable value (int, or nested tuple for E)."""
        return elem.value if isinstance(elem, FieldElement) else elem

    def host_elem(self, value) -> FieldElement:
        return self.host(value)

    def flat(self, value) -> list:
        """Proof/transcript component order for a challenge value."""
        if isinstance(value, FieldElement):
            value = value.value
        return _flat_components(value, self.degree)

    def host_value(self, arr):
        """Single-element device array (D*K,) or (D*K, 1) -> value."""
        if arr.ndim == 1:
            arr = arr[:, None]
        if self.degree == 1:
            return int(self.f.to_ints(arr).ravel()[0])
        return self.fd.to_tuples(arr)[0]

    def host_values(self, arr) -> list:
        """Device array (D*K, Q) -> list of Q host values (ints or nested
        tuples).  One transfer for the whole batch — the batched counterpart
        of :meth:`host_value` for query openings."""
        if self.degree == 1:
            return [int(v) for v in self.f.to_ints(arr).ravel()]
        return self.fd.to_tuples(arr)

    def unflatten_leaf(self, vals, count: int) -> list:
        """Inverse of :meth:`leaf_base_values` for a ``count``-element leaf:
        flat base ints (component-major) -> host E FieldElements."""
        if self.degree == 1:
            return [self.host(v) for v in vals[:count]]
        return [
            self.host(_nest_components(
                [int(vals[b * count + i]) for b in range(self.degree)],
                self.degree))
            for i in range(count)
        ]

    def scale_base(self, base_arr, elem):
        """E-constant * F-array -> (D*K, *batch).  Component j of the
        result is c_j * t — no full extension multiply needed because the
        second operand lies in the base field."""
        value = self.value_of(elem)
        if self.degree == 1:
            return self.f.mul(
                base_arr, self.f.constant(int(value), base_arr.shape[1:]))
        comps = _flat_components(value, self.degree)
        return jnp.concatenate([
            self.f.mul(base_arr, self.f.constant(c, base_arr.shape[1:]))
            for c in comps], axis=0)

    # -- embedding ----------------------------------------------------------
    def lift(self, arr):
        """Embed a base-field array into E unless it already is E-shaped
        (axis 0 = D*K digits)."""
        if arr.shape[0] == self.fd.num_digits:
            return arr
        return self.embed(arr)

    def embed(self, arr):
        """Base-field digit array (K, *b) -> challenge-field (D*K, *b)."""
        if self.degree == 1:
            return arr
        pad_shape = ((self.degree - 1) * self.f.num_digits,) + arr.shape[1:]
        return jnp.concatenate(
            [arr, jnp.zeros(pad_shape, jnp.uint32)], axis=0)

    def as_base_columns(self, arr):
        """(D*K, m, L) challenge array -> (K, D*m, L) base-field columns
        (component-major), for Merkle committing E-valued leaves with the
        plain batch backend."""
        if self.degree == 1:
            return arr
        K = self.f.num_digits
        blocks = [arr[i * K:(i + 1) * K] for i in range(self.degree)]
        return jnp.concatenate(blocks, axis=1)

    def leaf_base_values(self, values) -> list:
        """Host leaf values (list of ints/tuples) -> flat base ints in the
        same component-major order as :meth:`as_base_columns`."""
        if self.degree == 1:
            return [int(v) for v in values]
        comps = [_flat_components(
            v.value if isinstance(v, FieldElement) else v, self.degree)
            for v in values]
        return [comps[j][b] for b in range(self.degree)
                for j in range(len(values))]

    # -- transcript ---------------------------------------------------------
    def sample(self, transcript) -> FieldElement:
        """One challenge in E (degree base-field samples, low-to-high)."""
        if self.degree == 1:
            return transcript.sample_field_element()
        comps = [int(transcript.sample_field_element())
                 for _ in range(self.degree)]
        return self.host(_nest_components(comps, self.degree))

    def append(self, transcript, elem):
        """Append a challenge value (component order matches sampling)."""
        for c in self.flat(elem):
            transcript.append_field_element(self.f(c))

    def sample_z_ood(self, transcript, lde_coset_offset, lde_size: int,
                     trace_root_order: int) -> FieldElement:
        """z outside the LDE coset and trace domain (``is_transcript.rs:21``).
        In a proper extension any z with a nonzero non-base component is
        automatically outside both (they live in F)."""
        if self.degree == 1:
            return transcript.sample_z_ood(lde_coset_offset, lde_size,
                                           trace_root_order)
        while True:
            z = self.sample(transcript)
            if any(c != 0 for c in self.flat(z)[1:]):
                return z
            # all-zero extension part: fall back to the base-field checks
            base = self.f(self.flat(z)[0])
            if (base ** lde_size) != self.f(lde_coset_offset) ** lde_size \
                    and (base ** (1 << trace_root_order)) != self.f(1):
                return z

    # -- componentwise NTT --------------------------------------------------
    def _componentwise(self, fn, arr, *args, **kwargs):
        if self.degree == 1:
            return fn(self.f, arr, *args, **kwargs)
        K = self.f.num_digits
        outs = [fn(self.f, arr[i * K:(i + 1) * K], *args, **kwargs)
                for i in range(self.degree)]
        return jnp.concatenate(outs, axis=0)

    def interpolate_offset_fft(self, evals, offset: int):
        return self._componentwise(ntt.interpolate_offset_fft, evals, offset)

    def interpolate_fft(self, evals):
        return self._componentwise(ntt.interpolate_fft, evals)

    def evaluate_offset_fft(self, coeffs, blowup_factor=1, domain_size=None,
                            offset=1):
        return self._componentwise(ntt.evaluate_offset_fft, coeffs,
                                   blowup_factor, domain_size, offset)

    # -- evaluation at a challenge point ------------------------------------
    def powers_of(self, elem, count: int):
        """Device (D*K, count) array [1, x, x^2, ...] by log-doubling."""
        fd = self.fd
        if self.degree == 1:
            return ntt.powers(self.f, int(elem) % self.f.p, count)
        arr = fd.ones((1,))
        x1 = fd.constant(self.value_of(elem), (1,))
        total = 1 << max(count - 1, 1).bit_length()
        while arr.shape[-1] < count:
            m = arr.shape[-1]
            xm = fd.mul(arr[..., m - 1:m], x1)  # x^m
            arr = jnp.concatenate(
                [arr, fd.mul(jnp.broadcast_to(xm, arr.shape), arr)], axis=-1)
        return arr[..., :count]

    def evaluate_coeffs_at(self, base_coeffs, elem):
        """Evaluate base-field coefficient arrays (K, ..., n) at a
        challenge point: dot with the E-powers ladder + modular tree
        reduction.  Returns (D*K, ...)."""
        n = base_coeffs.shape[-1]
        coeffs = self.embed(base_coeffs)
        pows = self.powers_of(elem, n)
        pows = pows.reshape((coeffs.shape[0],) + (1,) * (coeffs.ndim - 2)
                            + (n,))
        prods = self.fd.mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))
        return field_sum(self.fd, prods, axis=-1)

    def evaluate_ext_coeffs_at(self, ext_coeffs, elem):
        """Same but the coefficients are already challenge-field arrays."""
        n = ext_coeffs.shape[-1]
        pows = self.powers_of(elem, n)
        pows = pows.reshape((ext_coeffs.shape[0],)
                            + (1,) * (ext_coeffs.ndim - 2) + (n,))
        prods = self.fd.mul(ext_coeffs,
                            jnp.broadcast_to(pows, ext_coeffs.shape))
        return field_sum(self.fd, prods, axis=-1)
