"""KZG polynomial commitment scheme.

Parity: ``KateZaveruchaGoldberg`` + ``StructuredReferenceString``
(``crypto/src/commitments/kzg.rs:16,139``, ``traits.rs:6``): commit = MSM
over the SRS G1 powers, open via Ruffini quotient, batched opens with
upsilon powers, pairing-equation verification
``e(C - y*G1, G2) * e(-pi, tau*G2 - x*G2) == 1``.

TPU-native split: the MSMs (commit/open over big polynomials) run on the
batched device Pippenger; quotients and the two verification pairings are
exact host math.
"""

from __future__ import annotations

import dataclasses

from ..curves.msm import msm as _msm
from ..curves.pairings import AffinePoint, PairingConfig, compute_batch
from ..curves.weierstrass import ProjectivePoint
from ..poly.polynomial import Polynomial


@dataclasses.dataclass
class StructuredReferenceString:
    """Powers of tau in both groups (``kzg.rs:16``)."""

    powers_main_group: list  # [tau^i G1] host points
    powers_secondary_group: list  # [G2, tau G2] AffinePoints over Fp2

    @classmethod
    def insecure_setup(cls, cfg: PairingConfig, size: int, tau: int = None):
        """Test-only SRS from a known tau (the reference ships test SRS
        fixtures; real SRS files load via ``from_file``/``deserialize``)."""
        import random

        tau = tau if tau is not None else random.randrange(2, cfg.r)
        g1 = cfg.g1_curve.generator()
        g2 = cfg.g2_generator()
        main, acc = [], 1
        for _ in range(size):
            main.append(g1.operate_with_self(acc))
            acc = acc * tau % cfg.r
        return cls(main, [g2, g2.mul(tau)])

    def serialize(self) -> bytes:
        """Uncompressed binary layout (role of ``kzg.rs`` as_bytes /
        ``from_file``, kzg.rs:40): G1 count, G1 affine (x||y) big-endian
        pairs, then the two G2 points as Fp2 affine ((x0,x1),(y0,y1))."""
        out = bytearray()
        pts = self.powers_main_group
        nb = pts[0].curve.field.params.num_bytes
        out += len(pts).to_bytes(4, "big")
        out += nb.to_bytes(2, "big")
        for pt in pts:
            aff = pt.to_affine()
            out += aff.x.to_bytes(nb, "big") + aff.y.to_bytes(nb, "big")
        for q in self.powers_secondary_group[:2]:
            for comp in (q.x, q.y):
                c = comp.value if hasattr(comp, "value") else comp
                c0, c1 = (c if isinstance(c, tuple) else (c, 0))
                out += int(c0).to_bytes(nb, "big") + int(c1).to_bytes(nb, "big")
        return bytes(out)

    @classmethod
    def deserialize(cls, cfg: PairingConfig, data: bytes):
        """Inverse of :meth:`serialize`."""
        from ..utils.errors import DeserializationError

        try:
            count = int.from_bytes(data[0:4], "big")
            nb = int.from_bytes(data[4:6], "big")
            off = 6
            main = []
            for _ in range(count):
                x = int.from_bytes(data[off:off + nb], "big")
                y = int.from_bytes(data[off + nb:off + 2 * nb], "big")
                off += 2 * nb
                main.append(cfg.g1_curve.point(x, y))
            sec = []
            for _ in range(2):
                comps = []
                for _ in range(2):
                    c0 = int.from_bytes(data[off:off + nb], "big")
                    c1 = int.from_bytes(data[off + nb:off + 2 * nb], "big")
                    off += 2 * nb
                    comps.append((c0, c1))
                sec.append(AffinePoint(cfg.fp2, cfg.fp2(comps[0]),
                                       cfg.fp2(comps[1])))
            if off != len(data):
                raise ValueError("trailing bytes")
        except (IndexError, ValueError) as exc:
            raise DeserializationError(str(exc)) from exc
        return cls(main, sec)

    # -- reference binary format -------------------------------------------
    # Byte-exact lambdaworks SRS layout (``kzg.rs`` AsBytes/Deserializable):
    #   [4B protocol version = 0][8B LE G1 count]
    #   [G1 points: x||y||z, canonical coordinates, little-endian]
    #   [2 G2 points: x||y||z with each Fp2 coordinate as c0||c1,
    #    field_extension.rs:164]
    # Points may carry any projective representative; z == 0 encodes the
    # neutral element [0, 1, 0] (``short_weierstrass/point.rs:374``).

    def serialize_reference(self) -> bytes:
        pts = self.powers_main_group
        nb = pts[0].curve.field.params.num_bytes
        out = bytearray(b"\x00" * 4)
        out += len(pts).to_bytes(8, "little")
        for pt in pts:
            # stored projective representative, so parse -> re-serialize
            # round-trips the reference's own files byte-for-byte
            for c in (pt.x, pt.y, pt.z):
                out += int(c).to_bytes(nb, "little")
        for q in self.powers_secondary_group[:2]:
            if getattr(q, "inf", False):
                coords = ((0, 0), (1, 0), (0, 0))
            else:
                def _c(v):
                    v = v.value if hasattr(v, "value") else v
                    return v if isinstance(v, tuple) else (int(v), 0)

                coords = (_c(q.x), _c(q.y), (1, 0))
            for c0, c1 in coords:
                out += int(c0).to_bytes(nb, "little")
                out += int(c1).to_bytes(nb, "little")
        return bytes(out)

    @classmethod
    def deserialize_reference(cls, cfg: PairingConfig, data: bytes):
        from ..utils.errors import DeserializationError

        curve = cfg.g1_curve
        p = curve.field.p
        nb = curve.field.params.num_bytes
        g1_size, g2_size = 3 * nb, 6 * nb
        try:
            if data[:4] != b"\x00" * 4:
                raise ValueError("unsupported protocol version")
            count = int.from_bytes(data[4:12], "little")
            if len(data) != 12 + count * g1_size + 2 * g2_size:
                raise ValueError("byte length does not match G1 count")
            off = 12
            main = []
            for _ in range(count):
                x = int.from_bytes(data[off:off + nb], "little")
                y = int.from_bytes(data[off + nb:off + 2 * nb], "little")
                z = int.from_bytes(data[off + 2 * nb:off + 3 * nb], "little")
                off += g1_size
                pt = ProjectivePoint(curve, x, y, z)
                if z == 0:
                    if not (x == 0 and y != 0):
                        raise ValueError("invalid point at infinity")
                    pt = curve.neutral()
                else:
                    zinv = pow(z, -1, p)
                    if curve.defining_equation(x * zinv % p,
                                               y * zinv % p) != 0:
                        raise ValueError("G1 point not on curve")
                main.append(pt)
            sec = []
            for _ in range(2):
                comps = []
                for _ in range(3):
                    c0 = int.from_bytes(data[off:off + nb], "little")
                    c1 = int.from_bytes(data[off + nb:off + 2 * nb],
                                        "little")
                    off += 2 * nb
                    comps.append((c0, c1))
                x2, y2, z2 = (cfg.fp2(c) for c in comps)
                if z2.is_zero():
                    sec.append(AffinePoint.infinity(cfg.fp2))
                    continue
                xa, ya = x2 / z2, y2 / z2
                if ya * ya != xa * xa * xa + cfg.fp2(cfg.twist_b):
                    raise ValueError("G2 point not on twist")
                sec.append(AffinePoint(cfg.fp2, xa, ya))
        except (IndexError, ValueError) as exc:
            raise DeserializationError(str(exc)) from exc
        return cls(main, sec)

    def to_file(self, path: str, format: str = "native") -> None:
        data = (self.serialize_reference() if format == "reference"
                else self.serialize())
        with open(path, "wb") as fh:
            fh.write(data)

    @classmethod
    def from_file(cls, cfg: PairingConfig, path: str,
                  format: str = "native"):
        """Load an SRS from a binary file (``kzg.rs:40`` parity);
        ``format="reference"`` reads lambdaworks' own SRS files."""
        with open(path, "rb") as fh:
            data = fh.read()
        if format == "reference":
            return cls.deserialize_reference(cfg, data)
        return cls.deserialize(cfg, data)


class KateZaveruchaGoldberg:
    """IsCommitmentScheme parity (``crypto/src/commitments/traits.rs:6``)."""

    def __init__(self, cfg: PairingConfig, srs: StructuredReferenceString,
                 msm_method: str = "pippenger"):
        self.cfg = cfg
        self.srs = srs
        self.method = msm_method
        # scalars act modulo the subgroup order
        self.field = None

    def commit(self, poly: Polynomial):
        coeffs = [c.value for c in poly.coefficients]
        if not coeffs:
            return self.cfg.g1_curve.neutral()
        points = self.srs.powers_main_group[: len(coeffs)]
        return _msm(self.cfg.g1_curve, coeffs, points, method=self.method)

    def open(self, x, y, poly: Polynomial):
        quotient = (poly - y).ruffini_division(x)
        return self.commit(quotient) if not quotient.is_zero() \
            else self.cfg.g1_curve.neutral()

    def verify(self, x, y, p_commitment, proof) -> bool:
        cfg = self.cfg
        g1 = cfg.g1_curve.generator()
        g2 = self.srs.powers_secondary_group[0]
        tau_g2 = self.srs.powers_secondary_group[1]
        lhs_g1 = p_commitment.operate_with(
            g1.operate_with_self(int(y)).neg()
        )
        rhs_g2 = _g2_sub(tau_g2, _g2_scale(g2, int(x)))
        result = compute_batch(cfg, [
            (lhs_g1, g2),
            (proof.neg(), rhs_g2),
        ])
        return result == cfg.fp12(1)

    def open_batch(self, x, ys, polynomials, upsilon):
        acc_poly = Polynomial.zero(polynomials[0].field)
        for poly in reversed(polynomials):
            acc_poly = acc_poly * upsilon + poly
        acc_y = ys[0].field(0)
        for y in reversed(ys):
            acc_y = acc_y * upsilon + y
        return self.open(x, acc_y, acc_poly)

    def verify_batch(self, x, ys, p_commitments, proof, upsilon) -> bool:
        acc_commit = self.cfg.g1_curve.neutral()
        for c in reversed(p_commitments):
            acc_commit = acc_commit.operate_with_self(
                int(upsilon)).operate_with(c)
        acc_y = ys[0].field(0)
        for y in reversed(ys):
            acc_y = acc_y * upsilon + y
        return self.verify(x, acc_y, acc_commit, proof)


def _g2_scale(q: AffinePoint, k: int) -> AffinePoint:
    return q.mul(k)


def _g2_sub(a: AffinePoint, b: AffinePoint) -> AffinePoint:
    return a + b.neg()
