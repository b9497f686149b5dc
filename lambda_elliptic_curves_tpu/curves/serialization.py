"""EC point serialization: projective/uncompressed byte forms and
Zcash-style point compression for BLS12-381 and BN254 (G1 + G2).

Parity:
- generic serialize/deserialize — ``short_weierstrass/point.rs:239,281``
  (``PointFormat::{Projective,Uncompressed}`` x ``Endianness``), with the
  same validation rules (z==0 must be the neutral element; affine points
  must satisfy the defining equation).
- compression — ``bls12_381/compression.rs`` (48/96-byte, 3 control bits
  0x80 compressed / 0x40 infinity / 0x20 larger-root) and
  ``bn_254/compression.rs`` (32/64-byte, 2 control bits: ``10`` smaller
  root, ``11`` larger root, ``01`` infinity).
- Fp2 square root — ``bls12_381/sqrt.rs`` Algorithm 8 of
  eprint 2012/685, with the reference's exact root-selection convention
  (``select_sqrt_value_from_third_bit``).

These are host-side wire-format functions (a few field ops per point);
bulk point math stays on device in :mod:`.weierstrass` / :mod:`.msm`.
"""

from __future__ import annotations

from ..utils.errors import DeserializationError
from .pairings import (
    AffinePoint, BLS12381Pairing, BN254Pairing, check_subgroup,
)
from .weierstrass import ProjectivePoint


# ---------------------------------------------------------------------------
# generic byte forms (any host curve point)
# ---------------------------------------------------------------------------

def _fe_to_bytes(value, num_bytes: int, endianness: str) -> bytes:
    """Field value (int or component tuple, low component first) -> bytes.
    Extension values serialize component 0 first, like the reference's
    ``ByteConversion`` for ``[FieldElement; N]`` extension elements."""
    if isinstance(value, tuple):
        return b"".join(_fe_to_bytes(v, num_bytes, endianness) for v in value)
    return int(value).to_bytes(num_bytes, endianness)


def _fe_from_bytes(data: bytes, num_bytes: int, endianness: str, degree: int):
    if degree == 1:
        return int.from_bytes(data, endianness)
    step = len(data) // degree
    return tuple(int.from_bytes(data[i * step:(i + 1) * step], endianness)
                 for i in range(degree))


def serialize_point(point, point_format: str = "projective",
                    endianness: str = "big") -> bytes:
    """``ShortWeierstrassProjectivePoint::serialize`` parity
    (``point.rs:239``): x||y||z (projective) or affine x||y (uncompressed).
    Accepts host :class:`ProjectivePoint` (G1) and :class:`AffinePoint`
    (G1/G2 over extension fields)."""
    if point_format not in ("projective", "uncompressed"):
        raise ValueError(f"unknown point format {point_format!r}")
    if endianness not in ("big", "little"):
        raise ValueError(f"unknown endianness {endianness!r}")

    if isinstance(point, ProjectivePoint):
        nb = point.curve.field.params.num_bytes
        if point_format == "projective":
            coords = (point.x, point.y, point.z)
        else:
            aff = point.to_affine()
            coords = ((0, 0) if aff.z == 0 else (aff.x, aff.y))
        return b"".join(_fe_to_bytes(c, nb, endianness) for c in coords)

    # AffinePoint over a (possibly extension) host field
    f = point.field
    nb = (f.prime_field() if hasattr(f, "prime_field") else f).params.num_bytes
    x = point.x.value if not point.inf else 0
    y = point.y.value if not point.inf else 0
    one = 0 if point.inf else 1
    if hasattr(f, "degree") and point.inf:
        zero_v = f(0).value
        x = y = zero_v
    if point_format == "projective":
        z = f(one).value if hasattr(f, "degree") else one
        return (_fe_to_bytes(x, nb, endianness)
                + _fe_to_bytes(y, nb, endianness)
                + _fe_to_bytes(z, nb, endianness))
    return _fe_to_bytes(x, nb, endianness) + _fe_to_bytes(y, nb, endianness)


def deserialize_point(curve, data: bytes, point_format: str = "projective",
                      endianness: str = "big"):
    """``point.rs:281`` parity, for host G1 curves (``WeierstrassCurve``).
    Validates: projective z==0 must encode the neutral element; any other
    point must satisfy the defining equation."""
    nb = curve.field.params.num_bytes
    if point_format == "projective":
        if len(data) != 3 * nb:
            raise DeserializationError("invalid amount of bytes")
        x, y, z = (_fe_from_bytes(data[i * nb:(i + 1) * nb], nb, endianness, 1)
                   for i in range(3))
        if z == 0:
            pt = ProjectivePoint(curve, x, y, 0)
            if x == 0:  # neutral is (0 : y : 0) with y != 0 by convention
                return pt
            raise DeserializationError("z=0 but not the neutral element")
        p = curve.field.p
        zinv = pow(z, -1, p)
        if curve.defining_equation(x * zinv % p, y * zinv % p) != 0:
            raise DeserializationError("point not on curve")
        return ProjectivePoint(curve, x, y, z)
    if point_format == "uncompressed":
        if len(data) != 2 * nb:
            raise DeserializationError("invalid amount of bytes")
        x = _fe_from_bytes(data[:nb], nb, endianness, 1)
        y = _fe_from_bytes(data[nb:], nb, endianness, 1)
        if curve.defining_equation(x, y) != 0:
            raise DeserializationError("point not on curve")
        return ProjectivePoint(curve, x, y, 1)
    raise ValueError(f"unknown point format {point_format!r}")


# ---------------------------------------------------------------------------
# Fp2 square root (Algorithm 8, eprint 2012/685) — ``sqrt.rs:24``
# ---------------------------------------------------------------------------

def _select_root(r1: int, r2: int, third_bit: int) -> int:
    """``select_sqrt_value_from_third_bit``: bit 1 -> the larger root."""
    if third_bit:
        return max(r1, r2)
    return min(r1, r2)


def sqrt_fp2(fp2, value, third_bit: int):
    """Square root in Fp2 = Fp[u]/(u^2 - nr) with nr = -1 (both BLS12-381
    and BN254 towers use u^2 = -1).  Returns a host Fp2 FieldElement or
    None if ``value`` is not a square.  ``third_bit`` selects which root,
    with the reference's exact convention on the c0 component."""
    base = fp2.base
    p = base.p
    assert fp2.non_residue % p == p - 1, "sqrt_fp2 assumes u^2 = -1"
    a, b = (int(c) for c in fp2(value).value)
    if a == 0 and b == 0:
        return fp2((0, 0))
    if b == 0:
        # root may live in Fp (a square) or be purely imaginary (u * sqrt)
        r = base.params.sqrt(a)
        if r is not None:
            return fp2((_select_root(r, (-r) % p, third_bit), 0))
        # a = -(c^2) * nr ... with nr = -1: sqrt(a) = c * u where c^2 = -a
        c = base.params.sqrt((-a) % p)
        if c is None:
            return None
        return fp2((0, _select_root(c, (-c) % p, third_bit)))
    # alpha = norm(value) = a^2 - nr*b^2; with nr = -1: a^2 + b^2
    alpha = (a * a + b * b) % p
    if base.params.legendre(alpha) != 1:
        return None
    s = base.params.sqrt(alpha)
    two_inv = pow(2, -1, p)
    delta = (a + s) * two_inv % p
    if base.params.legendre(delta) == -1:
        delta = (a - s) % p * two_inv % p
    x0r = base.params.sqrt(delta)
    if x0r is None:
        return None
    x0 = _select_root(x0r, (-x0r) % p, third_bit)
    x1 = b * pow(2 * x0 % p, -1, p) % p
    return fp2((x0, x1))


# ---------------------------------------------------------------------------
# compression specs per curve family
# ---------------------------------------------------------------------------

def _fp2_lex_larger(y: tuple, y_neg: tuple) -> bool:
    """Reference G2 sign rule: y > -y where (c0, c1) compares c0 first
    (``compression.rs`` Ordering match arms)."""
    if y[0] != y_neg[0]:
        return y[0] > y_neg[0]
    return y[1] > y_neg[1]


class _Spec:
    """Byte widths + control-bit conventions for one curve family."""

    def __init__(self, cfg, nb, bls_style):
        self.cfg = cfg
        self.nb = nb              # base-field bytes (48 or 32)
        self.bls_style = bls_style  # True: 3 control bits; False: 2

    # -- flag helpers -------------------------------------------------------
    def infinity_bytes(self, size: int) -> bytes:
        out = bytearray(size)
        out[0] = 0b1100_0000 if self.bls_style else 0b0100_0000
        return bytes(out)

    def set_flags(self, out: bytearray, larger_root: bool):
        out[0] |= 1 << 7
        if larger_root:
            out[0] |= (1 << 5) if self.bls_style else (1 << 6)

    def parse_flags(self, data: bytes):
        """-> (is_infinity, third_bit, masked_first_byte)."""
        first = data[0]
        if self.bls_style:
            prefix = first >> 5
            if not (prefix & 4):
                raise DeserializationError("value is not compressed")
            if prefix & 2:
                return True, 0, 0
            return False, prefix & 1, first & 0x1F
        prefix = first >> 6
        if prefix == 0:
            raise DeserializationError("value is not compressed")
        if prefix == 1:
            return True, 0, 0
        return False, prefix & 1, first & 0x3F


_SPECS = {
    "bls12_381": _Spec(BLS12381Pairing, 48, bls_style=True),
    "bn254": _Spec(BN254Pairing, 32, bls_style=False),
}


def _spec(curve_name: str) -> _Spec:
    try:
        return _SPECS[curve_name]
    except KeyError:
        raise ValueError(
            f"no compression spec for {curve_name!r}; "
            f"available: {sorted(_SPECS)}") from None


# ---------------------------------------------------------------------------
# G1 compression
# ---------------------------------------------------------------------------

def compress_g1(curve_name: str, point) -> bytes:
    """``compress_g1_point`` parity — 48 bytes (BLS12-381) / 32 (BN254)."""
    spec = _spec(curve_name)
    nb = spec.nb
    if point.is_neutral_element():
        return spec.infinity_bytes(nb)
    aff = point.to_affine()
    p = spec.cfg.g1_curve.field.p
    out = bytearray(int(aff.x).to_bytes(nb, "big"))
    y = int(aff.y)
    spec.set_flags(out, larger_root=((-y) % p) < y)
    return bytes(out)


def decompress_g1(curve_name: str, data: bytes):
    """``decompress_g1_point`` parity.  BLS12-381 additionally requires
    subgroup membership (the reference's ``PointNotInSubgroup``)."""
    spec = _spec(curve_name)
    cfg = spec.cfg
    curve = cfg.g1_curve
    if len(data) != spec.nb:
        raise DeserializationError("invalid amount of bytes")
    inf, third_bit, first = spec.parse_flags(data)
    if inf:
        return curve.neutral()
    p = curve.field.p
    x = int.from_bytes(bytes([first]) + data[1:], "big")
    if x >= p:
        raise DeserializationError("x out of range")
    y2 = (x * x % p * x + curve.a * x + curve.b) % p
    r = curve.field.params.sqrt(y2)
    if r is None:
        raise DeserializationError("x is not on the curve")
    y = _select_root(r, (-r) % p, third_bit)
    point = curve.point(x, y)
    if curve_name == "bls12_381" and not check_subgroup(cfg, point, False):
        raise DeserializationError("point not in subgroup")
    return point


# ---------------------------------------------------------------------------
# G2 compression
# ---------------------------------------------------------------------------

def compress_g2(curve_name: str, point: AffinePoint) -> bytes:
    """``compress_g2_point`` parity — 96 bytes (BLS12-381) / 64 (BN254).
    Wire order is c1||c0 big-endian (the reference's ``x_rev``)."""
    spec = _spec(curve_name)
    nb = spec.nb
    if point.inf:
        return spec.infinity_bytes(2 * nb)
    p = spec.cfg.g1_curve.field.p
    x0, x1 = (int(c) for c in point.x.value)
    y = tuple(int(c) for c in point.y.value)
    y_neg = tuple((-c) % p for c in y)
    out = bytearray(x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big"))
    spec.set_flags(out, larger_root=_fp2_lex_larger(y, y_neg))
    return bytes(out)


def decompress_g2(curve_name: str, data: bytes) -> AffinePoint:
    """``decompress_g2_point`` parity (on-curve check via from-affine;
    like the reference, no subgroup check on this path)."""
    spec = _spec(curve_name)
    cfg = spec.cfg
    nb = spec.nb
    if len(data) != 2 * nb:
        raise DeserializationError("invalid amount of bytes")
    inf, third_bit, first = spec.parse_flags(data)
    if inf:
        return AffinePoint.infinity(cfg.fp2)
    p = cfg.g1_curve.field.p
    x1 = int.from_bytes(bytes([first]) + data[1:nb], "big")
    x0 = int.from_bytes(data[nb:], "big")
    if x0 >= p or x1 >= p:
        raise DeserializationError("x out of range")
    fp2 = cfg.fp2
    x = fp2((x0, x1))
    y2 = x * x * x + fp2(cfg.twist_b)
    y = sqrt_fp2(fp2, y2, third_bit)
    if y is None:
        raise DeserializationError("x is not on the twist")
    pt = AffinePoint(fp2, x, y)
    if y * y != y2:
        raise DeserializationError("inconsistent root")
    return pt
