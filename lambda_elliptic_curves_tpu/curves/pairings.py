"""Pairings: optimal ate over BLS12-381, BLS12-377 and BN254.

Parity: ``IsPairing``/``compute_batch`` + Miller loop + final exponentiation
(``curves/bls12_381/pairing.rs:96,118,246``, ``bn_254/pairing.rs``,
``bls12_377/pairing.rs``), including the subgroup-check errors.

Implementation notes: pairings are *protocol-sized* (a handful per KZG or
Groth16 verification), so this is the exact host path — Python-int tower
arithmetic (:mod:`.tower`).

The fast path (``pairing``/``compute_batch``) is twist-native: the Miller
loop runs on E'(Fp2) in homogeneous projective coordinates, lines are
evaluated at P as *sparse* Fp12 elements (3 nonzero Fp2 coefficients —
``mul_by_014`` for M-twists, ``mul_by_034`` for D-twists), line scalings by
Fp2 constants are free because the final exponentiation annihilates them,
and the final exponentiation uses Frobenius/conjugation for the easy part
plus a shared-cyclotomic-squaring base-p multi-exponentiation for the hard
part — exactly ``f^((p^12-1)/r)``, no curve-specific chain assumed.

A generic slow oracle (affine E(Fp12) Miller loop + plain hard exponent)
is kept as ``pairing_generic`` for differential testing.
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields.element import FieldElement
from ..fields.extensions import ExtensionField
from ..fields import zoo as FZ
from ..utils.errors import PairingError
from . import zoo as CZ
from .tower import Tower


# ---------------------------------------------------------------------------
# generic affine points over host (extension) fields
# ---------------------------------------------------------------------------

class AffinePoint:
    """Affine point with infinity flag over any host field object."""

    __slots__ = ("field", "x", "y", "inf", "a")

    def __init__(self, field, x, y, inf=False, a=0):
        self.field = field
        self.x = x if isinstance(x, FieldElement) else field(x)
        self.y = y if isinstance(y, FieldElement) else field(y)
        self.inf = inf
        self.a = a  # curve coefficient a (host element or int)

    @classmethod
    def infinity(cls, field, a=0):
        return cls(field, 0, 1, inf=True, a=a)

    def __eq__(self, other):
        if self.inf or other.inf:
            return self.inf == other.inf
        return self.x == other.x and self.y == other.y

    def neg(self):
        return AffinePoint(self.field, self.x, -self.y, self.inf, self.a)

    __neg__ = neg

    def double(self):
        if self.inf or self.y.is_zero():
            return AffinePoint.infinity(self.field, self.a)
        f = self.field
        lam = (f(3) * self.x * self.x + f(self.a)) / (f(2) * self.y)
        x3 = lam * lam - self.x - self.x
        y3 = lam * (self.x - x3) - self.y
        return AffinePoint(f, x3, y3, a=self.a)

    def add(self, other):
        if self.inf:
            return other
        if other.inf:
            return self
        if self.x == other.x:
            if self.y == other.y:
                return self.double()
            return AffinePoint.infinity(self.field, self.a)
        lam = (other.y - self.y) / (other.x - self.x)
        x3 = lam * lam - self.x - other.x
        y3 = lam * (self.x - x3) - self.y
        return AffinePoint(self.field, x3, y3, a=self.a)

    __add__ = add

    def mul(self, k: int):
        acc = AffinePoint.infinity(self.field, self.a)
        add = self
        k = int(k)
        while k:
            if k & 1:
                acc = acc + add
            add = add.double()
            k >>= 1
        return acc

    __mul__ = mul
    __rmul__ = mul


# ---------------------------------------------------------------------------
# pairing configuration per curve family
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PairingConfig:
    name: str
    family: str  # "bls" or "bn"
    g1_curve: object
    fp2: ExtensionField
    fp6: ExtensionField
    fp12: ExtensionField
    twist_b: tuple  # Fp2 value
    g2_x: tuple
    g2_y: tuple
    r: int
    x_param: int  # BLS z (sign via x_is_negative) / BN parameter
    x_is_negative: bool
    twist_type: str  # "M" (x/w^2) or "D" (x*w^2)

    # -- embeddings ---------------------------------------------------------
    def embed_fp(self, v: int):
        """Fp -> Fp12."""
        return self.fp12(((v, (0, 0), (0, 0)), ((0, 0), (0, 0), (0, 0))))

    def embed_fp2(self, c: tuple):
        return self.fp12((((int(c[0]), int(c[1])), (0, 0), (0, 0)),
                          ((0, 0), (0, 0), (0, 0))))

    def w(self):
        """The Fp12 generator w (w^2 = v)."""
        return self.fp12((((0, 0), (0, 0), (0, 0)),
                          ((1, 0), (0, 0), (0, 0))))

    def untwist(self, x2: tuple, y2: tuple):
        """E'(Fp2) -> E(Fp12)."""
        X = self.embed_fp2(x2)
        Y = self.embed_fp2(y2)
        w = self.w()
        w2, w3 = w * w, w * w * w
        if self.twist_type == "M":
            return X / w2, Y / w3
        return X * w2, Y * w3

    def g2_generator(self):
        return AffinePoint(self.fp2, self.fp2(self.g2_x), self.fp2(self.g2_y))

    def g2_point_to_fp12(self, q: AffinePoint) -> AffinePoint:
        if q.inf:
            return AffinePoint.infinity(self.fp12)
        x, y = self.untwist(q.x.value, q.y.value)
        return AffinePoint(self.fp12, x, y)

    def g1_point_to_fp12(self, p) -> AffinePoint:
        aff = p.to_affine()
        if aff.z == 0:
            return AffinePoint.infinity(self.fp12)
        return AffinePoint(self.fp12, self.embed_fp(aff.x),
                           self.embed_fp(aff.y))

    @functools.cached_property
    def tower(self) -> Tower:
        """Fast tuple-arithmetic tower for this curve's Fp12."""
        return Tower(self.g1_curve.field.p, self.fp2.non_residue,
                     self.fp6.non_residue)


# ---------------------------------------------------------------------------
# generic slow oracle (affine Miller loop over E(Fp12)); kept for
# differential testing of the fast path
# ---------------------------------------------------------------------------

def _line(a: AffinePoint, b: AffinePoint, p: AffinePoint):
    """Evaluate the line through a, b (or tangent if a == b) at p."""
    f = a.field
    if a.inf or b.inf:
        # vertical through the finite one
        pt = b if a.inf else a
        if pt.inf:
            return f(1)
        return p.x - pt.x
    if a.x == b.x and a.y != b.y:
        return p.x - a.x
    if a == b:
        lam = (f(3) * a.x * a.x) / (f(2) * a.y)
    else:
        lam = (b.y - a.y) / (b.x - a.x)
    return p.y - a.y - lam * (p.x - a.x)


def _miller_loop(cfg: PairingConfig, q12: AffinePoint, p12: AffinePoint,
                 m: int):
    """f_{m, Q}(P) with the standard double-and-add accumulation."""
    f = cfg.fp12(1)
    t = q12
    for bit in bin(m)[3:]:
        f = f * f * _line(t, t, p12)
        t = t.double()
        if bit == "1":
            f = f * _line(t, q12, p12)
            t = t + q12
    return f, t


def _conjugate_fp12(cfg, f):
    """f^(p^6): negate the w-component."""
    c0, c1 = f.value
    return cfg.fp12((c0, cfg.fp6.host_neg(c1)))


def _frobenius(cfg, pt: AffinePoint) -> AffinePoint:
    """(x, y) -> (x^p, y^p) on E(Fp12)."""
    if pt.inf:
        return pt
    p = cfg.g1_curve.field.p
    return AffinePoint(cfg.fp12, pt.x**p, pt.y**p)


def final_exponentiation_generic(cfg: PairingConfig, f):
    """f^((p^12-1)/r), easy part by Frobenius/conjugation + hard part as a
    plain exponent (``pairing.rs:246`` role) — oracle path."""
    p = cfg.g1_curve.field.p
    # easy: f^(p^6 - 1) = conj(f)/f ; then ^(p^2 + 1)
    f = _conjugate_fp12(cfg, f) / f
    f = f ** (p * p) * f
    # hard: (p^4 - p^2 + 1) / r
    hard = (p**4 - p**2 + 1) // cfg.r
    return f**hard


def pairing_generic(cfg: PairingConfig, p, q: AffinePoint):
    """Slow generic e(P, Q): affine Miller loop over the untwisted curve
    E(Fp12) + plain-exponent final exponentiation.  Differential oracle for
    :func:`pairing`; no subgroup checks."""
    if p.to_affine().z == 0 or q.inf:
        return cfg.fp12(1)
    p12 = cfg.g1_point_to_fp12(p)
    q12 = cfg.g2_point_to_fp12(q)

    if cfg.family == "bls":
        m = abs(cfg.x_param)
        f, _ = _miller_loop(cfg, q12, p12, m)
        if cfg.x_is_negative:
            f = _conjugate_fp12(cfg, f)
        return final_exponentiation_generic(cfg, f)

    # BN family: m = |6x + 2|, then the two Frobenius line corrections
    x = cfg.x_param
    m = 6 * x + 2
    f, t = _miller_loop(cfg, q12, p12, abs(m))
    if m < 0:
        f = _conjugate_fp12(cfg, f)
        t = t.neg()
    q1 = _frobenius(cfg, q12)
    q2 = _frobenius(cfg, q1).neg()
    f = f * _line(t, q1, p12)
    t = t + q1
    f = f * _line(t, q2, p12)
    return final_exponentiation_generic(cfg, f)


# ---------------------------------------------------------------------------
# fast twist-native path
# ---------------------------------------------------------------------------

def _tw_double(t: Tower, T):
    """Projective doubling on E'(Fp2) (a=0) + line coefficients.

    Line through T (tangent) evaluated at affine P, scaled by the Fp2
    constant 2YZ^2 (free modulo final exponentiation):
    ``l = c_y*y_P + c_x*x_P + c_c`` with
    c_c = 3X^3 - 2Y^2 Z, c_x = -3X^2 Z, c_y = 2YZ^2.
    """
    X, Y, Z = T
    sq, mul, add, sub = t.f2_sq, t.f2_mul, t.f2_add, t.f2_sub
    xx = sq(X)
    w3 = add(add(xx, xx), xx)          # 3X^2
    s = mul(Y, Z)
    yy = sq(Y)
    b = mul(mul(X, yy), Z)             # B = X*Y*S = X Y^2 Z
    h = sub(sq(w3), t.f2_scalar(8, b))
    x3 = t.f2_scalar(2, mul(h, s))
    ys2 = sq(mul(Y, s))                # (Y S)^2 = Y^2 S^2
    y3 = sub(mul(w3, sub(t.f2_scalar(4, b), h)), t.f2_scalar(8, ys2))
    z3 = t.f2_scalar(8, mul(sq(s), s))
    # line
    c_c = sub(t.f2_scalar(3, mul(X, xx)), t.f2_scalar(2, mul(yy, Z)))
    c_x = t.f2_neg(mul(w3, Z))
    c_y = t.f2_scalar(2, mul(s, Z))
    return (x3, y3, z3), (c_c, c_x, c_y)


def _tw_add(t: Tower, T, Q):
    """Mixed projective addition T + Q on E'(Fp2) + line coefficients.

    Line through T and Q at affine P, scaled by L = X - x2 Z:
    c_c = theta*x2 - L*y2, c_x = -theta, c_y = L,
    with theta = Y - y2 Z.
    """
    X, Y, Z = T
    x2, y2 = Q
    sq, mul, add, sub = t.f2_sq, t.f2_mul, t.f2_add, t.f2_sub
    theta = sub(Y, mul(y2, Z))
    lam = sub(X, mul(x2, Z))
    c_c = sub(mul(theta, x2), mul(lam, y2))
    c_x = t.f2_neg(theta)
    c_y = lam
    # projective mixed addition with u = -theta, v = -lam
    u = t.f2_neg(theta)
    v = t.f2_neg(lam)
    vv = sq(v)
    vvv = mul(vv, v)
    a = sub(sub(mul(sq(u), Z), vvv), t.f2_scalar(2, mul(vv, X)))
    x3 = mul(v, a)
    y3 = sub(mul(u, sub(mul(vv, X), a)), mul(vvv, Y))
    z3 = mul(vvv, Z)
    return (x3, y3, z3), (c_c, c_x, c_y)


def _apply_line(cfg: PairingConfig, t: Tower, f, coeffs, xp: int, yp: int):
    c_c, c_x, c_y = coeffs
    cx = t.f2_scalar(xp, c_x)
    cy = t.f2_scalar(yp, c_y)
    if cfg.twist_type == "M":
        # l = c_c + (c_x x_P) w^2 + (c_y y_P) w^3 -> components (0, 1, 4)
        return t.mul_by_014(f, c_c, cx, cy)
    # D: l = (c_y y_P) + (c_x x_P) w + c_c w^3 -> components (0, 3, 4)
    return t.mul_by_034(f, cy, cx, c_c)


def _g2_endo(cfg: PairingConfig, t: Tower, Q):
    """Untwist-Frobenius-twist endomorphism on E'(Fp2) for D-twists:
    (x, y) -> (conj(x) xi^((p-1)/3), conj(y) xi^((p-1)/2))."""
    x, y = Q
    return (t.f2_mul(t.f2_conj(x), t.gamma[2]),
            t.f2_mul(t.f2_conj(y), t.gamma[3]))


def miller_loop(cfg: PairingConfig, p, q: AffinePoint):
    """Twist-native Miller loop (``pairing.rs:118`` role): P in G1 host
    projective, Q in G2 affine over Fp2; returns an Fp12 tower tuple."""
    t = cfg.tower
    aff = p.to_affine()
    xp, yp = int(aff.x), int(aff.y)
    xq = tuple(int(c) for c in q.x.value)
    yq = tuple(int(c) for c in q.y.value)
    Q = (xq, yq)
    T = (xq, yq, (1, 0))
    f = t.one()

    m = abs(cfg.x_param) if cfg.family == "bls" else abs(6 * cfg.x_param + 2)
    first = True
    for bit in bin(m)[3:]:
        if not first:
            f = t.f12_sq(f)
        first = False
        T, coeffs = _tw_double(t, T)
        f = _apply_line(cfg, t, f, coeffs, xp, yp)
        if bit == "1":
            T, coeffs = _tw_add(t, T, Q)
            f = _apply_line(cfg, t, f, coeffs, xp, yp)

    if cfg.family == "bls":
        if cfg.x_is_negative:
            f = t.f12_conj(f)
        return f

    # BN: frobenius correction lines
    if 6 * cfg.x_param + 2 < 0:
        f = t.f12_conj(f)
        T = (T[0], t.f2_neg(T[1]), T[2])
    q1 = _g2_endo(cfg, t, Q)
    q2 = _g2_endo(cfg, t, q1)
    q2 = (q2[0], t.f2_neg(q2[1]))
    T, coeffs = _tw_add(t, T, q1)
    f = _apply_line(cfg, t, f, coeffs, xp, yp)
    T, coeffs = _tw_add(t, T, q2)
    f = _apply_line(cfg, t, f, coeffs, xp, yp)
    return f


def _tw_scalar_mul_is_neutral(cfg: PairingConfig, q: AffinePoint, k: int):
    """[k]Q == O on E'(Fp2) via fast projective tuple arithmetic."""
    t = cfg.tower
    xq = tuple(int(c) for c in q.x.value)
    yq = tuple(int(c) for c in q.y.value)
    acc = None  # None = infinity
    add_pt = (xq, yq, (1, 0))

    def pdouble(T):
        X, Y, Z = T
        sq, mul, add, sub = t.f2_sq, t.f2_mul, t.f2_add, t.f2_sub
        if Y == (0, 0) or Z == (0, 0):
            return None
        xx = sq(X)
        w3 = add(add(xx, xx), xx)
        s = mul(Y, Z)
        b = mul(mul(X, Y), s)
        h = sub(sq(w3), t.f2_scalar(8, b))
        x3 = t.f2_scalar(2, mul(h, s))
        y3 = sub(mul(w3, sub(t.f2_scalar(4, b), h)),
                 t.f2_scalar(8, sq(mul(Y, s))))
        z3 = t.f2_scalar(8, mul(sq(s), s))
        return (x3, y3, z3)

    def padd(T1, T2):
        if T1 is None:
            return T2
        if T2 is None:
            return T1
        X1, Y1, Z1 = T1
        X2, Y2, Z2 = T2
        mul, sub = t.f2_mul, t.f2_sub
        u1 = mul(Y2, Z1)
        u2 = mul(Y1, Z2)
        v1 = mul(X2, Z1)
        v2 = mul(X1, Z2)
        if v1 == v2:
            if u1 == u2:
                return pdouble(T1)
            return None
        u = sub(u1, u2)
        v = sub(v1, v2)
        w = mul(Z1, Z2)
        vv = t.f2_sq(v)
        vvv = mul(vv, v)
        a = sub(sub(mul(t.f2_sq(u), w), vvv), t.f2_scalar(2, mul(vv, v2)))
        return (mul(v, a),
                sub(mul(u, sub(mul(vv, v2), a)), mul(vvv, u2)),
                mul(vvv, w))

    k = int(k)
    while k:
        if k & 1:
            acc = padd(acc, add_pt)
        k >>= 1
        if k:
            add_pt = pdouble(add_pt)
            if add_pt is None:
                break
    return acc is None or acc[2] == (0, 0)


def check_subgroup(cfg: PairingConfig, point, is_g2: bool) -> bool:
    if is_g2:
        if point.inf:
            return True
        return _tw_scalar_mul_is_neutral(cfg, point, cfg.r)
    aff = point.to_affine()
    if aff.z == 0:
        return True
    return point.operate_with_self(cfg.r).is_neutral_element()


def pairing(cfg: PairingConfig, p, q: AffinePoint):
    """e(P, Q) with P in G1 (ProjectivePoint) and Q in G2 (AffinePoint over
    Fp2).  Raises PairingError outside the r-torsion (parity:
    ``bls12_381/pairing.rs:451``)."""
    if not check_subgroup(cfg, p, is_g2=False) or not check_subgroup(cfg, q, True):
        raise PairingError("point not in the r-torsion subgroup")
    if p.to_affine().z == 0 or q.inf:
        return cfg.fp12(1)
    t = cfg.tower
    f = miller_loop(cfg, p, q)
    return cfg.fp12(t.final_exponentiation(f, cfg.r))


def compute_batch(cfg: PairingConfig, pairs):
    """Product of pairings e(P_i, Q_i) (``pairing.rs:96``): one Miller loop
    per pair, a single shared final exponentiation."""
    t = cfg.tower
    acc = t.one()
    for p, q in pairs:
        if not check_subgroup(cfg, p, is_g2=False) or \
                not check_subgroup(cfg, q, True):
            raise PairingError("point not in the r-torsion subgroup")
        if p.to_affine().z == 0 or q.inf:
            continue
        acc = t.f12_mul(acc, miller_loop(cfg, p, q))
    return cfg.fp12(t.final_exponentiation(acc, cfg.r))


# ---------------------------------------------------------------------------
# concrete configurations
# ---------------------------------------------------------------------------

def _bls12_381() -> PairingConfig:
    fp = FZ.BLS12381Field
    fp2 = ExtensionField("bls12_381_fp2", fp, fp.p - 1, 2)
    fp6 = ExtensionField("bls12_381_fp6", fp2, (1, 1), 3)
    fp12 = ExtensionField("bls12_381_fp12", fp6,
                          ((0, 0), (1, 0), (0, 0)), 2)
    return PairingConfig(
        name="bls12_381", family="bls", g1_curve=CZ.BLS12381Curve,
        fp2=fp2, fp6=fp6, fp12=fp12,
        twist_b=(4, 4),
        g2_x=(
            int("024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647a"
                "e3d1770bac0326a805bbefd48056c8c121bdb8", 16),
            int("13e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc"
                "7f5049334cf11213945d57e5ac7d055d042b7e", 16),
        ),
        g2_y=(
            int("0ce5d527727d6e118cc9cdc6da2e351aadfd9baa8cbdd3a76d429a6951"
                "60d12c923ac9cc3baca289e193548608b82801", 16),
            int("0606c4a02ea734cc32acd2b02bc28b99cb3e287e85a763af267492ab57"
                "2e99ab3f370d275cec1da1aaa9075ff05f79be", 16),
        ),
        r=FZ.BLS12_381_ORDER,
        x_param=0xD201000000010000, x_is_negative=True,
        twist_type="M",
    )


def _bn254() -> PairingConfig:
    fp = FZ.BN254Field
    fp2 = ExtensionField("bn254_fp2", fp, fp.p - 1, 2)
    fp6 = ExtensionField("bn254_fp6", fp2, (9, 1), 3)
    fp12 = ExtensionField("bn254_fp12", fp6, ((0, 0), (1, 0), (0, 0)), 2)
    return PairingConfig(
        name="bn254", family="bn", g1_curve=CZ.BN254Curve,
        fp2=fp2, fp6=fp6, fp12=fp12,
        twist_b=(
            int("2b149d40ceb8aaae81be18991be06ac3b5b4c5e559dbefa33267e6dc24a138e5", 16),
            int("009713b03af0fed4cd2cafadeed8fdf4a74fa084e52d1852e4a2bd0685c315d2", 16),
        ),
        g2_x=(
            int("1800deef121f1e76426a00665e5c4479674322d4f75edadd46debd5cd992f6ed", 16),
            int("198e9393920d483a7260bfb731fb5d25f1aa493335a9e71297e485b7aef312c2", 16),
        ),
        g2_y=(
            int("12c85ea5db8c6deb4aab71808dcb408fe3d1e7690c43d37b4ce6cc0166fa7daa", 16),
            int("090689d0585ff075ec9e99ad690c3395bc4b313370b38ef355acdadcd122975b", 16),
        ),
        r=FZ.BN254_ORDER,
        x_param=4965661367192848881, x_is_negative=False,
        twist_type="D",
    )


def _bls12_377() -> PairingConfig:
    fp = FZ.BLS12377Field
    fp2 = ExtensionField("bls12_377_fp2", fp, fp.p - 5, 2)
    fp6 = ExtensionField("bls12_377_fp6", fp2, (0, 1), 3)
    fp12 = ExtensionField("bls12_377_fp12", fp6, ((0, 0), (1, 0), (0, 0)), 2)
    return PairingConfig(
        name="bls12_377", family="bls", g1_curve=CZ.BLS12377Curve,
        fp2=fp2, fp6=fp6, fp12=fp12,
        twist_b=(0, int(
            "10222f6db0fd6f343bd03737460c589dc7b4f91cd5fd889129207b63c6bf80"
            "00dd39e5c1ccccccd1c9ed9999999999a", 16)),
        g2_x=(
            int("018480be71c785fec89630a2a3841d01c565f071203e50317ea501f557db"
                "6b9b71889f52bb53540274e3e48f7c005196", 16),
            int("00ea6040e700403170dc5a51b1b140d5532777ee6651cecbe7223ece0799"
                "c9de5cf89984bff76fe6b26bfefa6ea16afe", 16),
        ),
        g2_y=(
            int("00690d665d446f7bd960736bcbb2efb4de03ed7274b49a58e458c282f832"
                "d204f2cf88886d8c7c2ef094094409fd4ddf", 16),
            int("00f8169fd28355189e549da3151a70aa61ef11ac3d591bf12463b01acee3"
                "04c24279b83f5e52270bd9a1cdd185eb8f93", 16),
        ),
        r=FZ.BLS12_377_ORDER,
        x_param=0x8508C00000000001, x_is_negative=False,
        twist_type="D",
    )


BLS12381Pairing = _bls12_381()
BN254Pairing = _bn254()
BLS12377Pairing = _bls12_377()
