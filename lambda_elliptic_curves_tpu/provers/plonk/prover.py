"""Plonk prover (parity: ``provers/plonk/src/prover.rs`` — the five rounds
documented at :20-24 and implemented at :311-630).

Bulk FFT work (round-3 evaluation-space quotient on the 4n coset) runs on
the device NTT; polynomial bookkeeping stays host-exact.  Blinding follows
the reference exactly: wires get Z_H-masked degree-2 blinders, z gets a
degree-3 blinder, and t_lo/mid/hi get the b0/b1 chaining (:515-520).
"""

from __future__ import annotations

import dataclasses

from ...poly import ntt
from ...poly.polynomial import Polynomial
from .setup import (
    CommonPreprocessedInput, VerificationKey, Witness,
    new_strong_fiat_shamir_transcript, point_to_bytes,
)


class TestRandomFieldGenerator:
    """Deterministic zero-randomness generator (parity with the reference
    test double)."""

    def __init__(self, field):
        self.field = field

    def __call__(self):
        return self.field(0)


class RandomFieldGenerator:
    def __init__(self, field, rng=None):
        import random

        self.field = field
        self.rng = rng or random.SystemRandom()

    def __call__(self):
        return self.field(self.rng.randrange(self.field.p))


@dataclasses.dataclass
class Proof:
    a_1: object
    b_1: object
    c_1: object
    z_1: object
    t_lo_1: object
    t_mid_1: object
    t_hi_1: object
    a_zeta: object
    b_zeta: object
    c_zeta: object
    s1_zeta: object
    s2_zeta: object
    z_zeta_omega: object
    w_zeta_1: object
    w_zeta_omega_1: object
    p_non_constant_zeta: object
    t_zeta: object


class Prover:
    def __init__(self, commitment_scheme, random_generator):
        self.cs = commitment_scheme
        self.rand = random_generator

    # ------------------------------------------------------------------
    def _blind(self, target: Polynomial, zh: Polynomial, n_blinders: int):
        bs = [self.rand() for _ in range(n_blinders)]
        return target + zh * Polynomial(target.field, bs)

    def _zh(self, field, n):
        return Polynomial.new_monomial(field(1), n) - Polynomial(field, [1])

    # ------------------------------------------------------------------
    def prove(self, witness: Witness, public_input,
              cpi: CommonPreprocessedInput, vk: VerificationKey) -> Proof:
        f = cpi.field
        transcript = new_strong_fiat_shamir_transcript(f, vk, public_input)
        n = cpi.n
        zh = self._zh(f, n)

        # ----- round 1: blinded wire polynomials -----
        p_a = self._blind(_interp(f, witness.a), zh, 2)
        p_b = self._blind(_interp(f, witness.b), zh, 2)
        p_c = self._blind(_interp(f, witness.c), zh, 2)
        a_1, b_1, c_1 = (self.cs.commit(p) for p in (p_a, p_b, p_c))
        for cm in (a_1, b_1, c_1):
            transcript.append_bytes(point_to_bytes(cm))

        # ----- round 2: permutation polynomial z -----
        beta = transcript.sample_field_element()
        gamma = transcript.sample_field_element()
        k1, k2 = cpi.k1, cpi.k1 * cpi.k1
        coeffs = [f(1)]
        lp = lambda w, eta: w + beta * eta + gamma
        for i in range(n - 1):
            a_i, b_i, c_i = witness.a[i], witness.b[i], witness.c[i]
            num = lp(a_i, cpi.domain[i]) * lp(b_i, cpi.domain[i] * k1) \
                * lp(c_i, cpi.domain[i] * k2)
            den = lp(a_i, cpi.s1_lagrange[i]) * lp(b_i, cpi.s2_lagrange[i]) \
                * lp(c_i, cpi.s3_lagrange[i])
            coeffs.append(coeffs[-1] * num / den)
        p_z = self._blind(_interp(f, coeffs), zh, 3)
        z_1 = self.cs.commit(p_z)
        transcript.append_bytes(point_to_bytes(z_1))

        # ----- round 3: quotient t = (gates + copy) / Z_H -----
        alpha = transcript.sample_field_element()
        degree = 4 * n
        offset = cpi.k1

        z_x_omega = Polynomial(f, [
            c * cpi.domain[i % n] for i, c in enumerate(p_z.coefficients)
        ])
        e1 = [f(1)] + [f(0)] * (n - 1)
        l1 = _interp(f, e1)
        pi_y = list(public_input) + [f(0)] * (n - len(public_input))
        p_pi = _interp(f, pi_y)

        # vectorised quotient: all 4n-coset evaluations stay on device as
        # (K, 4n) digit arrays — the hottest Plonk round runs as a handful
        # of batched field kernels instead of a host loop (prover.rs
        # round_3 under rayon; here: one fused XLA program).
        ev = lambda poly: _eval_offset_dev(f, poly, degree, offset)
        a_e, b_e, c_e = ev(p_a), ev(p_b), ev(p_c)
        ql_e, qr_e, qm_e = ev(cpi.ql), ev(cpi.qr), ev(cpi.qm)
        qo_e, qc_e, pi_e = ev(cpi.qo), ev(cpi.qc), ev(p_pi)
        x_e = ev(Polynomial.new_monomial(f(1), 1))
        z_e, zw_e = ev(p_z), ev(z_x_omega)
        s1_e, s2_e, s3_e = ev(cpi.s1), ev(cpi.s2), ev(cpi.s3)
        l1_e = ev(l1)
        zh_e = ev(zh)

        const = lambda v: f.constant(int(v), (degree,))
        add3 = lambda u, v, w: f.add(f.add(u, v), w)
        gates = add3(
            f.add(f.mul(f.mul(a_e, b_e), qm_e), f.mul(a_e, ql_e)),
            f.add(f.mul(b_e, qr_e), f.mul(c_e, qo_e)),
            f.add(qc_e, pi_e),
        )
        gamma_c = const(gamma)
        xb = f.mul(x_e, const(beta))
        f_i = f.mul(
            f.mul(add3(a_e, xb, gamma_c),
                  add3(b_e, f.mul(xb, const(k1)), gamma_c)),
            add3(c_e, f.mul(xb, const(k2)), gamma_c),
        )
        beta_c = const(beta)
        g_i = f.mul(
            f.mul(add3(a_e, f.mul(s1_e, beta_c), gamma_c),
                  add3(b_e, f.mul(s2_e, beta_c), gamma_c)),
            add3(c_e, f.mul(s3_e, beta_c), gamma_c),
        )
        perm1 = f.sub(f.mul(g_i, zw_e), f.mul(f_i, z_e))
        perm2 = f.mul(f.sub(z_e, const(1)), l1_e)
        alpha_c = const(alpha)
        numerator = f.add(
            f.mul(f.add(f.mul(perm2, alpha_c), perm1), alpha_c), gates)
        p_eval = f.mul(numerator, f.batch_inverse(zh_e))
        t_coeffs = ntt.interpolate_offset_fft(f, p_eval, int(offset))
        t = Polynomial(f, [int(v) for v in f.to_ints(t_coeffs)])

        tc = t.coefficients + [f(0)] * (3 * (n + 2) - len(t.coefficients))
        p_t_lo = Polynomial(f, tc[: n + 2])
        p_t_mid = Polynomial(f, tc[n + 2: 2 * (n + 2)])
        p_t_hi = Polynomial(f, tc[2 * (n + 2): 3 * (n + 2)])
        b0, b1 = self.rand(), self.rand()
        xn2 = Polynomial.new_monomial(f(1), n + 2)
        p_t_lo = p_t_lo + b0 * xn2
        p_t_mid = p_t_mid - b0 + b1 * xn2
        p_t_hi = p_t_hi - b1
        t_lo_1, t_mid_1, t_hi_1 = (self.cs.commit(p)
                                   for p in (p_t_lo, p_t_mid, p_t_hi))
        for cm in (t_lo_1, t_mid_1, t_hi_1):
            transcript.append_bytes(point_to_bytes(cm))

        # ----- round 4: evaluations at zeta -----
        zeta = transcript.sample_field_element()
        a_zeta = p_a.evaluate(zeta)
        b_zeta = p_b.evaluate(zeta)
        c_zeta = p_c.evaluate(zeta)
        s1_zeta = cpi.s1.evaluate(zeta)
        s2_zeta = cpi.s2.evaluate(zeta)
        z_zeta_omega = p_z.evaluate(zeta * cpi.omega)
        for v in (a_zeta, b_zeta, c_zeta, s1_zeta, s2_zeta, z_zeta_omega):
            transcript.append_field_element(v)

        # ----- round 5: openings -----
        upsilon = transcript.sample_field_element()
        zeta_n2 = zeta ** (n + 2)
        zeta_2n4 = zeta ** (2 * n + 4)
        l1_zeta = (zeta**n - f(1)) / (zeta - f(1)) / f(n)

        p_non_constant = cpi.qm * (a_zeta * b_zeta) + cpi.ql * a_zeta \
            + cpi.qr * b_zeta + cpi.qo * c_zeta + cpi.qc
        r21 = (a_zeta + beta * zeta + gamma) \
            * (b_zeta + beta * k1 * zeta + gamma) \
            * (c_zeta + beta * k2 * zeta + gamma)
        r22 = (a_zeta + beta * s1_zeta + gamma) \
            * (b_zeta + beta * s2_zeta + gamma) * beta * z_zeta_omega
        p_non_constant = p_non_constant \
            + (cpi.s3 * r22 - p_z * r21) * alpha \
            + p_z * (l1_zeta * alpha * alpha)

        partial_t = p_t_lo + p_t_mid * zeta_n2 + p_t_hi * zeta_2n4

        polynomials = [partial_t, p_non_constant, p_a, p_b, p_c,
                       cpi.s1, cpi.s2]
        ys = [p.evaluate(zeta) for p in polynomials]
        w_zeta_1 = self.cs.open_batch(zeta, ys, polynomials, upsilon)
        w_zeta_omega_1 = self.cs.open(zeta * cpi.omega, z_zeta_omega, p_z)

        return Proof(
            a_1=a_1, b_1=b_1, c_1=c_1, z_1=z_1,
            t_lo_1=t_lo_1, t_mid_1=t_mid_1, t_hi_1=t_hi_1,
            a_zeta=a_zeta, b_zeta=b_zeta, c_zeta=c_zeta,
            s1_zeta=s1_zeta, s2_zeta=s2_zeta, z_zeta_omega=z_zeta_omega,
            w_zeta_1=w_zeta_1, w_zeta_omega_1=w_zeta_omega_1,
            p_non_constant_zeta=ys[1], t_zeta=ys[0],
        )


# -- device FFT helpers over host polynomials ---------------------------------

def _interp(field, values) -> Polynomial:
    vals = [v.value if hasattr(v, "value") else int(v) for v in values]
    coeffs = ntt.interpolate_fft(field, field.array(vals))
    return Polynomial(field, [int(v) for v in field.to_ints(coeffs)])


def _eval_offset(field, poly: Polynomial, degree: int, offset) -> list:
    return [field(int(v)) for v in
            field.to_ints(_eval_offset_dev(field, poly, degree, offset))]


def _eval_offset_dev(field, poly: Polynomial, degree: int, offset):
    """(K, degree) device evaluations of ``poly`` on the offset coset."""
    arr = poly.to_device(degree) if poly.coeff_len() else field.zeros((degree,))
    return ntt.evaluate_offset_fft(field, arr, 1, degree, int(offset))


def _interp_offset(field, values, offset) -> Polynomial:
    vals = [v.value for v in values]
    coeffs = ntt.interpolate_offset_fft(field, field.array(vals), int(offset))
    return Polynomial(field, [int(v) for v in field.to_ints(coeffs)])
