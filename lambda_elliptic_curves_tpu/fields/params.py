"""Prime-field parameter records.

TPU-native counterpart of lambdaworks' trait lattice
(``IsField``/``IsPrimeField``/``IsFFTField``,
``math/src/field/traits.rs:71-288`` and the Montgomery backend
``math/src/field/fields/montgomery_backed_prime_fields.rs:34``): instead of
trait objects, a field is a frozen *parameter record* (modulus digits,
Montgomery constants, two-adic data) that drives one shared set of batched
digit kernels.  All derived constants are computed here at Python level with
exact integers — nothing is hardcoded except the public protocol parameters
(modulus, two-adic generator), which are standard published values.

Digit layout: an element is a little-endian vector of ``num_digits`` 16-bit
digits held in ``uint32`` lanes; batched arrays are digit-major, i.e. shape
``(num_digits, *batch)``, so each digit plane is a contiguous batch vector
that tiles onto the TPU VPU (8x128 lanes) with full utilisation.
"""

from __future__ import annotations

import dataclasses
import functools

DIGIT_BITS = 16
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def int_to_digits(value: int, num_digits: int) -> tuple[int, ...]:
    """Little-endian 16-bit digits of ``value``."""
    if value < 0:
        raise ValueError("value must be non-negative")
    digits = []
    for _ in range(num_digits):
        digits.append(value & DIGIT_MASK)
        value >>= DIGIT_BITS
    if value:
        raise ValueError("value does not fit in the given number of digits")
    return tuple(digits)


def digits_to_int(digits) -> int:
    """Inverse of :func:`int_to_digits` (accepts any iterable of ints)."""
    value = 0
    for i, d in enumerate(digits):
        value |= int(d) << (DIGIT_BITS * i)
    return value


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """Static description of a prime field F_p.

    Only ``name``, ``p`` and (for FFT fields) ``two_adicity`` /
    ``two_adic_root`` are inputs; everything else is derived exactly.

    ``two_adic_root`` is a generator of the order-``2**two_adicity``
    multiplicative subgroup, matching the reference's
    ``TWO_ADIC_PRIMITVE_ROOT_OF_UNITY`` so that NTT domains (and therefore
    every committed polynomial evaluation) agree bit-for-bit with
    lambdaworks (``math/src/field/traits.rs:71-95``).
    """

    name: str
    p: int
    two_adicity: int = 0
    two_adic_root: int = 0

    def __post_init__(self):
        if self.p < 3 or self.p % 2 == 0:
            raise ValueError("modulus must be an odd prime > 2")
        if self.two_adicity:
            root = self.two_adic_root
            if pow(root, 1 << self.two_adicity, self.p) != 1:
                raise ValueError(f"{self.name}: two_adic_root has wrong order")
            if pow(root, 1 << (self.two_adicity - 1), self.p) == 1:
                raise ValueError(f"{self.name}: two_adic_root is not primitive")

    # ---- derived sizes -------------------------------------------------
    @functools.cached_property
    def nbits(self) -> int:
        return self.p.bit_length()

    @functools.cached_property
    def num_digits(self) -> int:
        """Number of 16-bit digits (K)."""
        return -(-self.nbits // DIGIT_BITS)

    @functools.cached_property
    def num_bytes(self) -> int:
        """Serialized size: matches lambdaworks' limb-padded width (the
        reference serializes the full 64-bit-limb representation, e.g.
        32 bytes for Stark252, 48 for BLS12-381 base field —
        ``math/src/traits.rs:10``)."""
        limbs64 = -(-self.nbits // 64)
        return limbs64 * 8

    # ---- Montgomery constants (R = 2^(16*K)) ---------------------------
    @functools.cached_property
    def r(self) -> int:
        return pow(2, DIGIT_BITS * self.num_digits, self.p)

    @functools.cached_property
    def r2(self) -> int:
        return (self.r * self.r) % self.p

    @functools.cached_property
    def r_inv(self) -> int:
        return pow(self.r, self.p - 2, self.p)

    @functools.cached_property
    def mu16(self) -> int:
        """-p^{-1} mod 2^16 (digit-serial Montgomery quotient constant)."""
        return (-pow(self.p, -1, 1 << DIGIT_BITS)) % (1 << DIGIT_BITS)

    @functools.cached_property
    def p_digits(self) -> tuple[int, ...]:
        return int_to_digits(self.p, self.num_digits)

    @functools.cached_property
    def p_nonzero_digit_idx(self) -> tuple[int, ...]:
        """Indices of nonzero digits of p.  The Montgomery reduction loop
        statically skips zero digits, which makes sparse moduli (Stark252:
        3 nonzero digits out of 16; Goldilocks: 3 of 4) dramatically
        cheaper than dense ones — the TPU analogue of the reference's
        spare-bit-optimised CIOS (``math/src/unsigned_integer/montgomery.rs``).
        """
        return tuple(i for i, d in enumerate(self.p_digits) if d)

    # ---- roots of unity -------------------------------------------------
    def primitive_root_of_unity(self, order: int) -> int:
        """Generator of the 2^order subgroup, derived by repeated squaring
        exactly like ``IsFFTField::get_primitive_root_of_unity``
        (``math/src/field/traits.rs:82-94``)."""
        from ..utils.errors import RootOfUnityError

        if order == 0:
            return 1
        if not self.two_adicity or order > self.two_adicity:
            raise RootOfUnityError(
                f"{self.name} has no 2^{order} root of unity "
                f"(two-adicity {self.two_adicity})"
            )
        return pow(self.two_adic_root, 1 << (self.two_adicity - order), self.p)

    # ---- scalar host arithmetic (exact oracle path) ---------------------
    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def inv(self, a: int) -> int:
        from ..utils.errors import ZeroInverseError

        if a % self.p == 0:
            raise ZeroInverseError(f"inverse of zero in {self.name}")
        return pow(a, -1, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def legendre(self, a: int) -> int:
        """Legendre symbol in {-1, 0, 1} (cf. ``IsPrimeField::legendre_symbol``,
        ``math/src/field/traits.rs:214``)."""
        s = pow(a % self.p, (self.p - 1) // 2, self.p)
        return -1 if s == self.p - 1 else int(s)

    def sqrt(self, a: int):
        """Tonelli–Shanks square root; returns ``None`` for non-residues
        (cf. ``IsPrimeField::sqrt``, ``math/src/field/traits.rs:234``)."""
        a %= self.p
        if a == 0:
            return 0
        if self.legendre(a) != 1:
            return None
        p = self.p
        if p % 4 == 3:
            return pow(a, (p + 1) // 4, p)
        # factor p-1 = q * 2^s
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        # find a non-residue z
        z = 2
        while self.legendre(z) != -1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
        while t != 1:
            t2, i = t, 0
            while t2 != 1:
                t2 = t2 * t2 % p
                i += 1
                if i == m:
                    return None
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            t = t * c % p
            r = r * b % p
        return r
