"""Fast host tower arithmetic Fp2/Fp6/Fp12 for pairings.

Parity: the per-curve tower-field modules of the reference
(``curves/bls12_381/field_extension.rs``, ``bn_254/field_extension.rs``)
and the pairing internals they feed (cyclotomic square / Frobenius,
``bls12_381/pairing.rs:246,323,372``).

Design: pairings are protocol-sized host work (a handful per verification),
so this is plain-Python *tuple* arithmetic — no FieldElement wrappers, no
recursion through the generic ``ExtensionField`` machinery.  Elements:

* Fp2  = ``(a0, a1)``  ints, u^2 = beta
* Fp6  = ``(c0, c1, c2)`` Fp2 tuples, v^3 = xi (xi in Fp2)
* Fp12 = ``(g, h)`` Fp6 tuples, w^2 = v

The same tower layout as the generic ``ExtensionField`` values, so results
coerce directly into host field elements.

Sparse/fused ops provided: line-sparse products (``mul_by_014`` for
M-twists, ``mul_by_034`` for D-twists), Granger–Scott cyclotomic squaring,
Frobenius maps via precomputed ``xi^(j(p-1)/6)`` coefficients, and an exact
final-exponentiation hard part computed as a 4-way Frobenius multi-
exponentiation with shared cyclotomic squarings (no curve-specific
addition chain is assumed, so the result is exactly ``f^((p^4-p^2+1)/r)``).
"""

from __future__ import annotations


class Tower:
    """Arithmetic for Fp12 = Fp2[w] with w^6 = xi, tower (2,3,2)."""

    def __init__(self, p: int, beta: int, xi: tuple):
        self.p = p
        self.beta = beta % p
        self.xi = (xi[0] % p, xi[1] % p)
        assert (p - 1) % 6 == 0, "frobenius coefficients need 6 | p-1"
        # gamma[j] = xi^(j*(p-1)/6) for j = 0..5: w^(j*p) = gamma[j] * w^j
        e = (p - 1) // 6
        g1 = self.f2_pow(self.xi, e)
        gs = [(1, 0)]
        for _ in range(5):
            gs.append(self.f2_mul(gs[-1], g1))
        self.gamma = gs

    # ------------------------------------------------------------------ Fp2
    def f2_add(self, a, b):
        p = self.p
        return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)

    def f2_sub(self, a, b):
        p = self.p
        return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)

    def f2_neg(self, a):
        p = self.p
        return (-a[0] % p, -a[1] % p)

    def f2_conj(self, a):
        return (a[0], -a[1] % self.p)

    def f2_mul(self, a, b):
        p = self.p
        m0 = a[0] * b[0] % p
        m1 = a[1] * b[1] % p
        return ((m0 + self.beta * m1) % p,
                ((a[0] + a[1]) * (b[0] + b[1]) - m0 - m1) % p)

    def f2_sq(self, a):
        p = self.p
        # (a0 + a1 u)^2 = a0^2 + beta a1^2 + 2 a0 a1 u
        m = a[0] * a[1] % p
        return ((a[0] * a[0] + self.beta * a[1] * a[1]) % p, 2 * m % p)

    def f2_scalar(self, k, a):
        p = self.p
        return (k * a[0] % p, k * a[1] % p)

    def f2_inv(self, a):
        p = self.p
        norm = (a[0] * a[0] - self.beta * a[1] * a[1]) % p
        ninv = pow(norm, -1, p)
        return (a[0] * ninv % p, -a[1] * ninv % p)

    def f2_pow(self, a, e: int):
        out = (1, 0)
        acc = a
        e = int(e)
        while e:
            if e & 1:
                out = self.f2_mul(out, acc)
            acc = self.f2_sq(acc)
            e >>= 1
        return out

    def f2_mul_xi(self, a):
        return self.f2_mul(self.xi, a)

    # ------------------------------------------------------------------ Fp6
    def f6_add(self, a, b):
        return tuple(self.f2_add(x, y) for x, y in zip(a, b))

    def f6_sub(self, a, b):
        return tuple(self.f2_sub(x, y) for x, y in zip(a, b))

    def f6_neg(self, a):
        return tuple(self.f2_neg(x) for x in a)

    def f6_mul(self, a, b):
        f2m, f2a, f2s = self.f2_mul, self.f2_add, self.f2_sub
        v0 = f2m(a[0], b[0])
        v1 = f2m(a[1], b[1])
        v2 = f2m(a[2], b[2])
        c0 = f2a(v0, self.f2_mul_xi(
            f2s(f2s(f2m(f2a(a[1], a[2]), f2a(b[1], b[2])), v1), v2)))
        c1 = f2a(f2s(f2s(f2m(f2a(a[0], a[1]), f2a(b[0], b[1])), v0), v1),
                 self.f2_mul_xi(v2))
        c2 = f2a(f2s(f2s(f2m(f2a(a[0], a[2]), f2a(b[0], b[2])), v0), v2), v1)
        return (c0, c1, c2)

    def f6_sq(self, a):
        return self.f6_mul(a, a)

    def f6_mul_by_v(self, a):
        """v * (c0 + c1 v + c2 v^2) = xi c2 + c0 v + c1 v^2."""
        return (self.f2_mul_xi(a[2]), a[0], a[1])

    def f6_mul_by_01(self, a, c0, c1):
        """a * (c0 + c1 v), sparse."""
        f2m, f2a, f2s = self.f2_mul, self.f2_add, self.f2_sub
        t0 = f2m(a[0], c0)
        t1 = f2m(a[1], c1)
        o0 = f2a(t0, self.f2_mul_xi(f2m(a[2], c1)))
        o1 = f2a(f2s(f2s(f2m(f2a(a[0], a[1]), f2a(c0, c1)), t0), t1), (0, 0))
        o2 = f2a(f2m(a[2], c0), t1)
        return (o0, o1, o2)

    def f6_mul_by_1(self, a, c1):
        """a * (c1 v), sparse."""
        return (self.f2_mul_xi(self.f2_mul(a[2], c1)),
                self.f2_mul(a[0], c1), self.f2_mul(a[1], c1))

    def f6_scale(self, a, c):
        """a * c with c in Fp2."""
        return tuple(self.f2_mul(x, c) for x in a)

    def f6_inv(self, a):
        f2m, f2s, f2a = self.f2_mul, self.f2_sub, self.f2_add
        t0 = f2s(self.f2_sq(a[0]), self.f2_mul_xi(f2m(a[1], a[2])))
        t1 = f2s(self.f2_mul_xi(self.f2_sq(a[2])), f2m(a[0], a[1]))
        t2 = f2s(self.f2_sq(a[1]), f2m(a[0], a[2]))
        norm = f2a(f2m(a[0], t0),
                   self.f2_mul_xi(f2a(f2m(a[2], t1), f2m(a[1], t2))))
        ninv = self.f2_inv(norm)
        return (f2m(t0, ninv), f2m(t1, ninv), f2m(t2, ninv))

    # ----------------------------------------------------------------- Fp12
    ONE12 = None  # set below per instance

    def one(self):
        return (((1, 0), (0, 0), (0, 0)), ((0, 0), (0, 0), (0, 0)))

    def f12_mul(self, a, b):
        g0, h0 = a
        g1, h1 = b
        t0 = self.f6_mul(g0, g1)
        t1 = self.f6_mul(h0, h1)
        mid = self.f6_mul(self.f6_add(g0, h0), self.f6_add(g1, h1))
        return (self.f6_add(t0, self.f6_mul_by_v(t1)),
                self.f6_sub(self.f6_sub(mid, t0), t1))

    def f12_sq(self, a):
        g, h = a
        # (g + hw)^2 = g^2 + v h^2 + 2gh w ; Karatsuba-style
        t = self.f6_mul(g, h)
        s = self.f6_mul(self.f6_add(g, h),
                        self.f6_add(g, self.f6_mul_by_v(h)))
        c0 = self.f6_sub(self.f6_sub(s, t), self.f6_mul_by_v(t))
        return (c0, self.f6_add(t, t))

    def f12_conj(self, a):
        """a^(p^6): negate the w part."""
        return (a[0], self.f6_neg(a[1]))

    def f12_inv(self, a):
        g, h = a
        norm = self.f6_sub(self.f6_sq(g), self.f6_mul_by_v(self.f6_sq(h)))
        ninv = self.f6_inv(norm)
        return (self.f6_mul(g, ninv), self.f6_neg(self.f6_mul(h, ninv)))

    def f12_eq_one(self, a):
        return a == self.one()

    # -- w-basis helpers -----------------------------------------------------
    @staticmethod
    def to_wbasis(a):
        """((a0,a1,a2),(b0,b1,b2)) -> [c_j] with c_j the coeff of w^j."""
        (a0, a1, a2), (b0, b1, b2) = a
        return [a0, b0, a1, b1, a2, b2]

    @staticmethod
    def from_wbasis(c):
        return ((c[0], c[2], c[4]), (c[1], c[3], c[5]))

    def frobenius(self, a, power: int = 1):
        """a^(p^power) for power 1..5 via w^p = gamma[1] w."""
        c = self.to_wbasis(a)
        for _ in range(power % 6):
            c = [self.f2_mul(self.f2_conj(cj), self.gamma[j])
                 for j, cj in enumerate(c)]
        return self.from_wbasis(c)

    # -- sparse line products ------------------------------------------------
    def mul_by_014(self, a, c0, c1, c4):
        """a * ((c0, c1, 0) + (0, c4, 0) w)  (M-twist line shape)."""
        g, h = a
        t0 = self.f6_mul_by_01(g, c0, c1)
        t1 = self.f6_mul_by_1(h, c4)
        mid = self.f6_mul_by_01(self.f6_add(g, h), c0, self.f2_add(c1, c4))
        return (self.f6_add(t0, self.f6_mul_by_v(t1)),
                self.f6_sub(self.f6_sub(mid, t0), t1))

    def mul_by_034(self, a, c0, c3, c4):
        """a * ((c0, 0, 0) + (c3, c4, 0) w)  (D-twist line shape)."""
        g, h = a
        t0 = self.f6_scale(g, c0)
        t1 = self.f6_mul_by_01(h, c3, c4)
        mid = self.f6_mul_by_01(self.f6_add(g, h),
                                self.f2_add(c0, c3), c4)
        return (self.f6_add(t0, self.f6_mul_by_v(t1)),
                self.f6_sub(self.f6_sub(mid, t0), t1))

    # -- cyclotomic subgroup ---------------------------------------------------
    def _f4_sq(self, a, b):
        """(a + b s)^2 with s^2 = xi: returns (a^2 + xi b^2, 2ab) via
        Karatsuba."""
        t0 = self.f2_sq(a)
        t1 = self.f2_sq(b)
        o1 = self.f2_sub(self.f2_sub(self.f2_sq(self.f2_add(a, b)), t0), t1)
        return (self.f2_add(self.f2_mul_xi(t1), t0), o1)

    def cyclo_sq(self, f):
        """Granger–Scott squaring for f in the cyclotomic subgroup
        (``pairing.rs:323`` role).  Fp12 = Fp4[w] with w^3 = s, s^2 = xi;
        the three Fp4 components are (z0+z1 s, z2+z3 s, z4+z5 s) =
        (a0+b1 s, b0+a2 s, a1+b2 s)."""
        (a0, a1, a2), (b0, b1, b2) = f
        z0, z1 = a0, b1
        z2, z3 = b0, a2
        z4, z5 = a1, b2
        add, sub = self.f2_add, self.f2_sub

        def three_minus_two(t, z):
            # 3t - 2z
            r = sub(t, z)
            return add(add(r, r), t)

        def three_plus_two(t, z):
            r = add(t, z)
            return add(add(r, r), t)

        t0, t1 = self._f4_sq(z0, z1)
        n0 = three_minus_two(t0, z0)
        n1 = three_plus_two(t1, z1)
        t0, t1 = self._f4_sq(z2, z3)
        t2, t3 = self._f4_sq(z4, z5)
        n4 = three_minus_two(t0, z4)
        n5 = three_plus_two(t1, z5)
        n2 = three_plus_two(self.f2_mul_xi(t3), z2)
        n3 = three_minus_two(t2, z3)
        return ((n0, n4, n3), (n2, n1, n5))

    def cyclo_pow(self, f, e: int):
        """f^e for f in the cyclotomic subgroup; negative e via conjugation
        (``pairing.rs:372`` cyclotomic_pow_x role)."""
        if e < 0:
            f = self.f12_conj(f)
            e = -e
        out = self.one()
        started = False
        for bit in bin(e)[2:]:
            if started:
                out = self.cyclo_sq(out)
            if bit == "1":
                out = f if not started else self.f12_mul(out, f)
                started = True
        return out if started else self.one()

    # -- final exponentiation --------------------------------------------------
    def final_exponentiation(self, f, r: int):
        """Exact f^((p^12-1)/r) (``pairing.rs:246``): easy part by
        conjugation/Frobenius, hard part (p^4-p^2+1)/r as a 4-digit base-p
        multi-exponentiation f^{d0} (f^p)^{d1} (f^{p^2})^{d2} (f^{p^3})^{d3}
        with one shared cyclotomic-squaring chain and a 15-entry subset-
        product table."""
        p = self.p
        # easy: f^(p^6-1) then ^(p^2+1)
        f = self.f12_mul(self.f12_conj(f), self.f12_inv(f))
        f = self.f12_mul(self.frobenius(f, 2), f)
        # hard
        d = (p ** 4 - p ** 2 + 1) // r
        digits = [d % p, (d // p) % p, (d // p ** 2) % p, d // p ** 3]
        gs = [f, self.frobenius(f, 1), self.frobenius(f, 2),
              self.frobenius(f, 3)]
        table = [self.one()] * 16
        for s in range(1, 16):
            low = s & -s
            rest = s ^ low
            g = gs[low.bit_length() - 1]
            table[s] = g if rest == 0 else self.f12_mul(table[rest], g)
        nbits = max(x.bit_length() for x in digits)
        acc = self.one()
        for i in range(nbits - 1, -1, -1):
            acc = self.cyclo_sq(acc)
            s = (((digits[0] >> i) & 1)
                 | (((digits[1] >> i) & 1) << 1)
                 | (((digits[2] >> i) & 1) << 2)
                 | (((digits[3] >> i) & 1) << 3))
            if s:
                acc = self.f12_mul(acc, table[s])
        return acc
