"""Pinocchio SNARK (pre-Groth16) — parity: ``examples/pinocchio/src/``.

R1CS -> QAP (v/w/y polynomials + target), setup with toxic waste
(rv, rw, s, alpha_{v,w,y}, beta, gamma), 9-element proof, and the three
pairing checks: divisibility, span, and same-linear-combination.
"""

from __future__ import annotations

import dataclasses
import random

from ..curves.pairings import AffinePoint, BLS12381Pairing, pairing
from ..fields.zoo import BLS12381Fr
from ..poly.polynomial import Polynomial

Fr = BLS12381Fr
CFG = BLS12381Pairing


@dataclasses.dataclass
class PinocchioQAP:
    vs: list  # Polynomials, index 0 is the constant one
    ws: list
    ys: list
    target: Polynomial
    number_of_inputs: int
    number_of_outputs: int

    @classmethod
    def from_r1cs(cls, a_rows, b_rows, c_rows, number_of_inputs,
                  number_of_outputs):
        """Interpolate matrix columns over 1..m (Lagrange, like the
        reference's test QAPs)."""
        m = len(a_rows)
        xs = [Fr(i + 1) for i in range(m)]
        target = Polynomial(Fr, [1])
        for x in xs:
            target = target * Polynomial(Fr, [-x, Fr(1)])
        nvars = len(a_rows[0])

        def columns(rows):
            return [
                Polynomial.interpolate(xs, [Fr(rows[g][v]) for g in range(m)])
                for v in range(nvars)
            ]

        return cls(columns(a_rows), columns(b_rows), columns(c_rows),
                   target, number_of_inputs, number_of_outputs)

    # -- slices (qap.rs:89-132) ------------------------------------------
    def v_mid(self):
        return self.vs[self.number_of_inputs + 1:
                       len(self.vs) - self.number_of_outputs]

    def w_mid(self):
        return self.ws[self.number_of_inputs + 1:
                       len(self.ws) - self.number_of_outputs]

    def y_mid(self):
        return self.ys[self.number_of_inputs + 1:
                       len(self.ys) - self.number_of_outputs]

    def io_polys(self, polys):
        return ([polys[0]] + polys[1: self.number_of_inputs + 1]
                + polys[len(polys) - self.number_of_outputs:])

    def p_polynomial(self, cs):
        def combine(polys):
            acc = polys[0]
            for poly, c in zip(polys[1:], cs):
                acc = acc + poly * c
            return acc

        v = combine(self.vs)
        w = combine(self.ws)
        y = combine(self.ys)
        return v * w - y

    def h_polynomial(self, cs):
        q, r = self.p_polynomial(cs).long_division_with_remainder(self.target)
        if not r.is_zero():
            raise ValueError("invalid witness: p is not divisible by target")
        return q


@dataclasses.dataclass
class EvaluationKey:
    g1_vk: list
    g1_wk: list
    g2_wk: list
    g1_yk: list
    g1_alpha_vk: list
    g1_alpha_wk: list
    g1_alpha_yk: list
    g1_beta: list
    g2_s_i: list


@dataclasses.dataclass
class VerificationKey:
    g2: object
    g2_alpha_v: object
    g2_alpha_w: object
    g2_alpha_y: object
    g2_gamma: object
    g2_beta_gamma: object
    g1y_t: object
    g1_vk: list
    g2_wk: list
    g1_yk: list


@dataclasses.dataclass
class Proof:
    v: object
    w1: object
    w2: object
    y: object
    h: object
    v_prime: object
    w_prime: object
    y_prime: object
    z: object


def setup(qap: PinocchioQAP, rng=None):
    rng = rng or random.Random()
    s, av, aw, ay, beta, rv, rw, gamma = (
        Fr(rng.randrange(1, Fr.p)) for _ in range(8)
    )
    ry = rv * rw
    g1 = CFG.g1_curve.generator()
    g2 = CFG.g2_generator()
    sc = lambda fe: int(fe)

    ev = lambda poly: poly.evaluate(s)
    io_v = qap.io_polys(qap.vs)
    io_w = qap.io_polys(qap.ws)
    io_y = qap.io_polys(qap.ys)

    vk = VerificationKey(
        g2=g2,
        g2_alpha_v=g2.mul(sc(av)),
        g2_alpha_w=g2.mul(sc(aw)),
        g2_alpha_y=g2.mul(sc(ay)),
        g2_gamma=g2.mul(sc(gamma)),
        g2_beta_gamma=g2.mul(sc(beta * gamma)),
        g1y_t=g1.operate_with_self(sc(ry * ev(qap.target))),
        g1_vk=[g1.operate_with_self(sc(rv * ev(p))) for p in io_v],
        g2_wk=[g2.mul(sc(rw * ev(p))) for p in io_w],
        g1_yk=[g1.operate_with_self(sc(ry * ev(p))) for p in io_y],
    )
    vm, wm, ym = qap.v_mid(), qap.w_mid(), qap.y_mid()
    ek = EvaluationKey(
        g1_vk=[g1.operate_with_self(sc(rv * ev(p))) for p in vm],
        g1_wk=[g1.operate_with_self(sc(rw * ev(p))) for p in wm],
        g2_wk=[g2.mul(sc(rw * ev(p))) for p in wm],
        g1_yk=[g1.operate_with_self(sc(ry * ev(p))) for p in ym],
        g1_alpha_vk=[g1.operate_with_self(sc(rv * av * ev(p))) for p in vm],
        g1_alpha_wk=[g1.operate_with_self(sc(rw * aw * ev(p))) for p in wm],
        g1_alpha_yk=[g1.operate_with_self(sc(ry * ay * ev(p))) for p in ym],
        g1_beta=[
            g1.operate_with_self(sc(
                rv * beta * ev(v) + rw * beta * ev(w) + ry * beta * ev(y)
            ))
            for v, w, y in zip(vm, wm, ym)
        ],
        g2_s_i=[g2.mul(sc(s**i)) for i in range(qap.target.degree())],
    )
    return ek, vk


def _msm_g1(scalars, points):
    acc = CFG.g1_curve.neutral()
    for s, p in zip(scalars, points):
        if int(s):
            acc = acc.operate_with(p.operate_with_self(int(s)))
    return acc


def _msm_g2(scalars, points):
    acc = AffinePoint.infinity(CFG.fp2)
    for s, p in zip(scalars, points):
        if int(s):
            acc = acc + p.mul(int(s))
    return acc


def generate_proof(ek: EvaluationKey, qap: PinocchioQAP, c_coefficients):
    cs = [Fr(c) for c in c_coefficients]
    c_mid = cs[qap.number_of_inputs: len(cs) - qap.number_of_outputs]
    h = qap.h_polynomial(cs)
    hc = [c for c in h.coefficients]
    return Proof(
        v=_msm_g1(c_mid, ek.g1_vk),
        w1=_msm_g1(c_mid, ek.g1_wk),
        w2=_msm_g2(c_mid, ek.g2_wk),
        y=_msm_g1(c_mid, ek.g1_yk),
        v_prime=_msm_g1(c_mid, ek.g1_alpha_vk),
        w_prime=_msm_g1(c_mid, ek.g1_alpha_wk),
        y_prime=_msm_g1(c_mid, ek.g1_alpha_yk),
        z=_msm_g1(c_mid, ek.g1_beta),
        h=_msm_g2(hc, ek.g2_s_i[: len(hc)]),
    )


def verify(vk: VerificationKey, proof: Proof, c_inputs_outputs) -> bool:
    cio = [Fr(c) for c in c_inputs_outputs]
    v_io = vk.g1_vk[0].operate_with(_msm_g1(cio, vk.g1_vk[1:]))
    w_io = vk.g2_wk[0] + _msm_g2(cio, vk.g2_wk[1:])
    y_io = vk.g1_yk[0].operate_with(_msm_g1(cio, vk.g1_yk[1:]))

    b1 = pairing(CFG, v_io.operate_with(proof.v), w_io + proof.w2) == \
        pairing(CFG, vk.g1y_t, proof.h) * \
        pairing(CFG, y_io.operate_with(proof.y), vk.g2)
    b2 = (
        pairing(CFG, proof.v_prime, vk.g2) == pairing(CFG, proof.v, vk.g2_alpha_v)
        and pairing(CFG, proof.w_prime, vk.g2) == pairing(CFG, proof.w1, vk.g2_alpha_w)
        and pairing(CFG, proof.y_prime, vk.g2) == pairing(CFG, proof.y, vk.g2_alpha_y)
    )
    b3 = pairing(CFG, proof.z, vk.g2_gamma) == pairing(
        CFG, proof.v.operate_with(proof.w1).operate_with(proof.y),
        vk.g2_beta_gamma,
    )
    return b1 and b2 and b3
