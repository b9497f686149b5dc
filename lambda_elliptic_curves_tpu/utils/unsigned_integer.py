"""Unsigned big-integer helpers (parity surface:
``UnsignedInteger<N>``, ``math/src/unsigned_integer/element.rs:35``).

Host side these are plain Python ints; this module provides the fixed-width
semantics (wrapping arithmetic, shifts, hex/dec parsing, byte conversion)
and the digit-array bridge used by the device kernels.
"""

from __future__ import annotations

from ..fields.params import DIGIT_BITS


class UnsignedInteger:
    """Fixed-width unsigned integer (width in bits, multiple of 64)."""

    __slots__ = ("bits", "value")

    def __init__(self, bits: int, value: int = 0):
        self.bits = bits
        self.value = value & ((1 << bits) - 1)

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_hex(cls, bits: int, s: str) -> "UnsignedInteger":
        s = s.removeprefix("0x")
        if not s or any(c not in "0123456789abcdefABCDEF" for c in s):
            from .errors import CreationError

            raise CreationError(f"invalid hex string: {s!r}")
        return cls(bits, int(s, 16))

    @classmethod
    def from_dec_str(cls, bits: int, s: str) -> "UnsignedInteger":
        if not s.isdigit():
            from .errors import CreationError

            raise CreationError(f"invalid decimal string: {s!r}")
        return cls(bits, int(s))

    @classmethod
    def from_bytes_be(cls, bits: int, data: bytes) -> "UnsignedInteger":
        return cls(bits, int.from_bytes(data, "big"))

    @classmethod
    def from_bytes_le(cls, bits: int, data: bytes) -> "UnsignedInteger":
        return cls(bits, int.from_bytes(data, "little"))

    # -- arithmetic (wrapping) --------------------------------------------
    def _wrap(self, v: int) -> "UnsignedInteger":
        return UnsignedInteger(self.bits, v)

    def __add__(self, other):
        return self._wrap(self.value + int(other))

    def __sub__(self, other):
        return self._wrap(self.value - int(other))

    def __mul__(self, other):
        return self._wrap(self.value * int(other))

    def double_width_mul(self, other):
        """Full product as a double-width integer."""
        return UnsignedInteger(self.bits * 2, self.value * int(other))

    def div_rem(self, other):
        o = int(other)
        return self._wrap(self.value // o), self._wrap(self.value % o)

    def __lshift__(self, n):
        return self._wrap(self.value << n)

    def __rshift__(self, n):
        return self._wrap(self.value >> n)

    def __and__(self, other):
        return self._wrap(self.value & int(other))

    def __or__(self, other):
        return self._wrap(self.value | int(other))

    def __xor__(self, other):
        return self._wrap(self.value ^ int(other))

    # -- comparisons / conversions ------------------------------------------
    def __int__(self):
        return self.value

    def __eq__(self, other):
        return self.value == int(other)

    def __lt__(self, other):
        return self.value < int(other)

    def __le__(self, other):
        return self.value <= int(other)

    def to_hex(self) -> str:
        return format(self.value, "X")

    def to_bytes_be(self) -> bytes:
        return self.value.to_bytes(self.bits // 8, "big")

    def to_bytes_le(self) -> bytes:
        return self.value.to_bytes(self.bits // 8, "little")

    def limbs64(self) -> list:
        """Big-endian 64-bit limbs (the reference's limb layout)."""
        n = self.bits // 64
        return [(self.value >> (64 * (n - 1 - i))) & ((1 << 64) - 1)
                for i in range(n)]

    def to_digits16(self) -> list:
        """Little-endian 16-bit digits (the device layout)."""
        return [(self.value >> (DIGIT_BITS * i)) & 0xFFFF
                for i in range(self.bits // DIGIT_BITS)]

    def __repr__(self):
        return f"U{self.bits}({self.to_hex()})"


def U256(value=0) -> UnsignedInteger:
    return UnsignedInteger(256, int(value))


def U384(value=0) -> UnsignedInteger:
    return UnsignedInteger(384, int(value))


def U128(value=0) -> UnsignedInteger:
    return UnsignedInteger(128, int(value))


def U64(value=0) -> UnsignedInteger:
    return UnsignedInteger(64, int(value))
