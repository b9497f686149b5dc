"""Short Weierstrass curves: host points + batched device Jacobian kernels.

Parity surface: ``IsEllipticCurve``/``IsShortWeierstrass``
(``math/src/elliptic_curve/traits.rs:13``,
``short_weierstrass/traits.rs``), ``ShortWeierstrassProjectivePoint``
(``short_weierstrass/point.rs:19`` — ``double`` :54, add :91) and the
Jacobian variant (:383).

TPU-native design: the device path has no point objects — a batch of points
is a triple of digit arrays ``(x, y, z)`` each ``(K, *B)`` in Jacobian
coordinates (infinity ⇔ z = 0), and the group law is straight-line field
arithmetic with `select`s resolving the special cases (identity operands,
doubling, inverse points) — branchless, as the VPU wants it.  The host path
is an exact projective implementation over Python ints used for generators,
oracles and protocol-sized work.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..fields.field import PrimeField


@dataclasses.dataclass(frozen=True)
class WeierstrassCurve:
    """y^2 = x^3 + a x + b over ``field``; also carries subgroup data."""

    name: str
    field: PrimeField
    a: int
    b: int
    gx: int
    gy: int
    order: int = 0  # subgroup order (0 if unused)
    cofactor: int = 1

    def generator(self) -> "ProjectivePoint":
        return ProjectivePoint(self, self.gx, self.gy, 1)

    def neutral(self) -> "ProjectivePoint":
        return ProjectivePoint(self, 0, 1, 0)

    def defining_equation(self, x: int, y: int) -> int:
        p = self.field.p
        return (y * y - (x * x * x + self.a * x + self.b)) % p

    def point(self, x, y) -> "ProjectivePoint":
        pt = ProjectivePoint(self, int(x), int(y), 1)
        if self.defining_equation(int(x), int(y)) != 0:
            from ..utils.errors import CreationError

            raise CreationError(f"({x}, {y}) is not on {self.name}")
        return pt


class ProjectivePoint:
    """Host point in homogeneous projective coordinates (exact ints)."""

    __slots__ = ("curve", "x", "y", "z")

    def __init__(self, curve, x, y, z):
        self.curve = curve
        p = curve.field.p
        self.x, self.y, self.z = x % p, y % p, z % p

    def is_neutral_element(self) -> bool:
        return self.z == 0

    def to_affine(self):
        if self.z == 0:
            return self
        p = self.curve.field.p
        zinv = pow(self.z, -1, p)
        return ProjectivePoint(self.curve, self.x * zinv % p,
                               self.y * zinv % p, 1)

    def __eq__(self, other):
        p = self.curve.field.p
        return (
            self.x * other.z % p == other.x * self.z % p
            and self.y * other.z % p == other.y * self.z % p
            and (self.z == 0) == (other.z == 0)
        )

    def __repr__(self):
        a = self.to_affine()
        if a.z == 0:
            return "Point(infinity)"
        return f"Point({hex(a.x)}, {hex(a.y)})"

    def double(self):
        """Projective doubling (``short_weierstrass/point.rs:54``)."""
        p = self.curve.field.p
        if self.z == 0 or self.y == 0:
            return self.curve.neutral() if self.y == 0 else self
        X, Y, Z = self.x, self.y, self.z
        a = self.curve.a
        W = (a * Z * Z + 3 * X * X) % p
        S = Y * Z % p
        B = X * Y % p * S % p
        H = (W * W - 8 * B) % p
        X3 = 2 * H * S % p
        Y3 = (W * (4 * B - H) - 8 * Y * Y % p * S % p * S % p) % p
        Z3 = 8 * S * S % p * S % p
        return ProjectivePoint(self.curve, X3, Y3, Z3)

    def operate_with(self, other):
        """Group addition (``short_weierstrass/point.rs:91``)."""
        if self.z == 0:
            return other
        if other.z == 0:
            return self
        p = self.curve.field.p
        u1 = other.y * self.z % p
        u2 = self.y * other.z % p
        v1 = other.x * self.z % p
        v2 = self.x * other.z % p
        if v1 == v2:
            if u1 == u2:
                return self.double()
            return self.curve.neutral()
        u = (u1 - u2) % p
        v = (v1 - v2) % p
        w = self.z * other.z % p
        A = (u * u % p * w - v * v % p * v - 2 * v * v % p * v2) % p
        X3 = v * A % p
        Y3 = (u * (v * v % p * v2 - A) - v * v % p * v % p * u2) % p
        Z3 = v * v % p * v % p * w % p
        return ProjectivePoint(self.curve, X3, Y3, Z3)

    def __add__(self, other):
        return self.operate_with(other)

    def neg(self):
        return ProjectivePoint(self.curve, self.x, -self.y, self.z)

    def __neg__(self):
        return self.neg()

    def operate_with_self(self, times: int):
        """Double-and-add (``cyclic_group.rs:17``)."""
        result = self.curve.neutral()
        acc = self
        t = int(times)
        while t:
            if t & 1:
                result = result.operate_with(acc)
            acc = acc.double()
            t >>= 1
        return result

    def __mul__(self, times: int):
        return self.operate_with_self(times)

    __rmul__ = __mul__


# ---------------------------------------------------------------------------
# device (batched Jacobian) kernels
# ---------------------------------------------------------------------------

_JIT_CACHE: dict = {}  # (curve, op, shapes) -> jitted group-law kernel


class JacobianOps:
    """Batched Jacobian group law over digit arrays for one curve.

    ``add`` and ``double`` dispatch through per-(curve, shape) cached
    ``jax.jit`` wrappers: a batched EC add expands to tens of thousands of
    XLA ops, and MSM/scan pipelines invoke it in several places — sharing
    one subcomputation per shape keeps module size and compile time linear
    in the number of DISTINCT shapes instead of call sites (the tunneled
    backend otherwise takes tens of minutes per compile and rejects
    oversized modules outright).
    """

    def __init__(self, curve: WeierstrassCurve):
        self.curve = curve
        self.f = curve.field

    def _shared(self, name, impl, *pts):
        key = (self.curve.name, name,
               tuple(tuple((c.shape, str(c.dtype)) for c in pt)
                     for pt in pts))
        fn = _JIT_CACHE.get(key)
        if fn is None:
            import jax

            from ..ops import limbs

            def traced(*args, _impl=impl):
                # group-law kernels always trace with the compact limb
                # core: ~10x smaller XLA graphs (see force_compact_core)
                with limbs.force_compact_core():
                    return _impl(*args)

            fn = _JIT_CACHE[key] = jax.jit(traced)
        return fn(*pts)

    # -- conversions --------------------------------------------------------
    def from_host(self, points):
        """List of host points -> (x, y, z) digit arrays (Jacobian = affine
        with z=1, or z=0 for infinity)."""
        f = self.f
        xs, ys, zs = [], [], []
        for pt in points:
            aff = pt.to_affine()
            if aff.z == 0:
                xs.append(1)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(aff.x)
                ys.append(aff.y)
                zs.append(1)
        return f.array(xs), f.array(ys), f.array(zs)

    def to_host(self, pt):
        """(x, y, z) digit arrays -> list of host points."""
        f = self.f
        xs = f.to_ints(pt[0])
        ys = f.to_ints(pt[1])
        zs = f.to_ints(pt[2])
        out = []
        for x, y, z in zip(xs.ravel(), ys.ravel(), zs.ravel()):
            x, y, z = int(x), int(y), int(z)
            if z == 0:
                out.append(self.curve.neutral())
            else:
                p = f.p
                zinv = pow(z, -1, p)
                out.append(ProjectivePoint(
                    self.curve, x * zinv * zinv % p,
                    y * pow(zinv, 3, p) % p, 1,
                ))
        return out

    def neutral(self, batch_shape=()):
        f = self.f
        return (f.ones(batch_shape), f.ones(batch_shape), f.zeros(batch_shape))

    def is_neutral(self, pt):
        return self.f.is_zero(pt[2])

    def select(self, cond, pt_true, pt_false):
        f = self.f
        return tuple(f.select(cond, a, b) for a, b in zip(pt_true, pt_false))

    # -- group law ------------------------------------------------------------
    def double(self, pt):
        """Jacobian doubling (dbl-2007-bl, general a)."""
        return self._shared("double", self._double_impl, pt)

    def _double_impl(self, pt):
        f = self.f
        X, Y, Z = pt
        xx = f.square(X)
        yy = f.square(Y)
        yyyy = f.square(yy)
        zz = f.square(Z)
        s = f.sub(f.square(f.add(X, yy)), f.add(xx, yyyy))
        s = f.add(s, s)
        m = f.add(f.add(xx, f.add(xx, xx)), self._mul_a(f.square(zz)))
        x3 = f.sub(f.square(m), f.add(s, s))
        y8 = _times8(f, yyyy)
        y3 = f.sub(f.mul(m, f.sub(s, x3)), y8)
        z3 = f.sub(f.square(f.add(Y, Z)), f.add(yy, zz))
        # doubling a 2-torsion/infinity point yields infinity (z3 = 0 when
        # y = 0 or z = 0, which the formula already produces)
        return (x3, y3, z3)

    def _mul_a(self, v):
        a = self.curve.a % self.f.p
        if a == 0:
            return self.f.zeros(v.shape[1:])
        if a == 1:
            return v
        const = self.f.constant(a, v.shape[1:])
        return self.f.mul(const, v)

    def add(self, p1, p2):
        """Complete batched addition: handles identities, doubling and
        inverse pairs with selects (add-2007-bl core)."""
        return self._shared("add", self._add_impl, p1, p2)

    def _add_impl(self, p1, p2):
        f = self.f
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        z1z1 = f.square(Z1)
        z2z2 = f.square(Z2)
        u1 = f.mul(X1, z2z2)
        u2 = f.mul(X2, z1z1)
        s1 = f.mul(f.mul(Y1, Z2), z2z2)
        s2 = f.mul(f.mul(Y2, Z1), z1z1)
        h = f.sub(u2, u1)
        r = f.sub(s2, s1)
        hh = f.square(h)
        hhh = f.mul(h, hh)
        v = f.mul(u1, hh)
        x3 = f.sub(f.sub(f.square(r), hhh), f.add(v, v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(s1, hhh))
        z3 = f.mul(f.mul(Z1, Z2), h)
        out = (x3, y3, z3)

        p1_inf = f.is_zero(Z1)
        p2_inf = f.is_zero(Z2)
        same_x = f.is_zero(h)
        same_y = f.is_zero(r)
        # same x, same y -> doubling; same x, opposite y -> infinity
        dbl = self.double(p1)
        out = self.select(same_x & same_y, dbl, out)
        out = self.select(same_x & ~same_y & ~p1_inf & ~p2_inf,
                          self.neutral(out[0].shape[1:]), out)
        out = self.select(p1_inf, p2, out)
        out = self.select(p2_inf, p1, out)
        return out

    def add_mixed(self, p1, p2):
        """Mixed batched addition: ``p2`` must be affine-or-infinity
        (``Z2`` in {0, 1}, as produced by :meth:`from_host`).  Saves
        4M + 1S per lane over :meth:`add` by skipping the Z2
        normalisation (madd-2007-bl core; parity role: the reference's
        ``operate_with_affine``, ``short_weierstrass/point.rs:91``).
        Complete: identities, doubling and inverse pairs via selects."""
        return self._shared("add_mixed", self._add_mixed_impl, p1, p2)

    def _add_mixed_impl(self, p1, p2):
        f = self.f
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2  # Z2 in {0, 1}
        z1z1 = f.square(Z1)
        u2 = f.mul(X2, z1z1)
        s2 = f.mul(f.mul(Y2, Z1), z1z1)
        h = f.sub(u2, X1)
        r = f.sub(s2, Y1)
        hh = f.square(h)
        hhh = f.mul(h, hh)
        v = f.mul(X1, hh)
        x3 = f.sub(f.sub(f.square(r), hhh), f.add(v, v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(Y1, hhh))
        z3 = f.mul(Z1, h)
        out = (x3, y3, z3)

        p1_inf = f.is_zero(Z1)
        p2_inf = f.is_zero(Z2)
        same_x = f.is_zero(h)
        same_y = f.is_zero(r)
        dbl = self.double(p1)
        out = self.select(same_x & same_y, dbl, out)
        out = self.select(same_x & ~same_y & ~p1_inf & ~p2_inf,
                          self.neutral(out[0].shape[1:]), out)
        out = self.select(p1_inf, p2, out)
        out = self.select(p2_inf, p1, out)
        return out

    # -- reductions ---------------------------------------------------------
    # Compile-size discipline: a batched EC add expands to several thousand
    # XLA ops, so log-depth reductions must never unroll the combine across
    # levels.  Both reducers below are a single ``lax.scan`` over tree
    # levels with *dynamic* shifts — one combine body in the program,
    # log2(B) executions at runtime.

    def shift_down(self, pt, shift, fill=None):
        """prev_i = pt_{i - shift} along the last axis (identity-filled,
        dynamic shift); works for any leading batch dims."""
        import jax

        n = pt[0].shape[-1]
        fill = fill or self.neutral(pt[0].shape[1:])
        out = []
        for comp, fill_comp in zip(pt, fill):
            ext = jnp.concatenate([fill_comp, comp], axis=-1)
            out.append(jax.lax.dynamic_slice_in_dim(
                ext, n - shift, n, axis=-1))
        return tuple(out)

    def tree_reduce(self, pt):
        """Sum a (K, B) batch of points along the last axis: Hillis–Steele
        over log2(B) levels (one scanned body), total at index B-1."""
        import jax

        n = pt[0].shape[-1]
        if n == 1:
            return pt
        levels = (n - 1).bit_length()

        def body(carry, t):
            shift = jnp.left_shift(jnp.int32(1), t)
            prev = self.shift_down(carry, shift)
            return self.add(carry, prev), None

        out, _ = jax.lax.scan(body, pt, jnp.arange(levels, dtype=jnp.int32))
        return tuple(c[..., n - 1:] for c in out)

    def segmented_scan(self, pt, seg_start):
        """Inclusive segmented prefix-sum under the group law.

        ``seg_start``: uint32 1-markers for segment heads, shaped like the
        batch dims of ``pt`` (i.e. ``pt[0].shape[1:]``); the scan runs
        along the last axis.  Returns per position the running sum of its
        segment prefix; the last element of each segment holds the segment
        total.  Hillis–Steele with carried (value, flag) state — one
        scanned combine body.
        """
        import jax

        n = pt[0].shape[-1]
        levels = max((n - 1).bit_length(), 1)
        ones = jnp.ones_like(seg_start)

        def body(carry, t):
            ptc, flags = carry
            shift = jnp.left_shift(jnp.int32(1), t)
            prev = self.shift_down(ptc, shift)
            prev_flags = jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([ones, flags], axis=-1), n - shift, n,
                axis=-1)
            combined = self.add(ptc, prev)
            keep = flags == 1
            new_pt = self.select(keep, ptc, combined)
            new_flags = flags | prev_flags
            return (new_pt, new_flags), None

        (out, _), _ = jax.lax.scan(
            body, (pt, seg_start),
            jnp.arange(levels, dtype=jnp.int32),
        )
        return out


def _times8(f, v):
    v2 = f.add(v, v)
    v4 = f.add(v2, v2)
    return f.add(v4, v4)
