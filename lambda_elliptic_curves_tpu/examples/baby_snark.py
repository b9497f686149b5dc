"""BabySNARK: square span programs (parity: ``examples/baby-snark/src/``).

Square constraint system (U·w)^2 = 1 row-wise -> square span program ->
setup / prove / verify over BLS12-381 with hiding randomness delta.
"""

from __future__ import annotations

import dataclasses
import random

from ..curves.msm import msm as device_msm
from ..curves.pairings import AffinePoint, BLS12381Pairing, pairing
from ..fields.zoo import BLS12381Fr
from ..poly import ntt

H_OFFSET = 7
Fr = BLS12381Fr


@dataclasses.dataclass
class SquareConstraintSystem:
    """Rows u_i with constraint (u_i . w)^2 = 1 (``scs.rs``)."""

    constraints: list  # rows of ints
    number_of_public_inputs: int

    @classmethod
    def from_matrix(cls, matrix, number_of_public_inputs):
        return cls([[int(v) % Fr.p for v in row] for row in matrix],
                   number_of_public_inputs)


class SquareSpanProgram:
    def __init__(self, scs: SquareConstraintSystem):
        n = len(scs.constraints)
        self.number_of_constraints = 1 << (n - 1).bit_length() if n > 1 else 1
        self.number_of_public_inputs = scs.number_of_public_inputs
        self.matrix = scs.constraints
        self.input_size = len(scs.constraints[0])
        # u polynomials interpolate matrix columns over the gate domain;
        # padded rows of column 0 get value 1 (ssp.rs:137)
        self.u_columns = []
        for j in range(self.input_size):
            col = [row[j] for row in scs.constraints]
            pad_value = 1 if j == 0 else 0
            col += [pad_value] * (self.number_of_constraints - n)
            self.u_columns.append(col)

    def check_valid(self, inputs) -> bool:
        for row in self.matrix:
            acc = sum(a * int(b) for a, b in zip(row, inputs)) % Fr.p
            if acc * acc % Fr.p != 1:
                return False
        return True

    def u_at_tau(self, tau: int) -> list:
        coeffs = ntt.interpolate_fft(Fr, Fr.array(self.u_columns))
        from ..poly.polynomial import evaluate_coeffs_at

        vals = evaluate_coeffs_at(Fr, coeffs, tau)
        return [int(v) for v in Fr.to_ints(vals)]

    def calculate_h_coefficients(self, inputs, delta: int) -> list:
        n = self.number_of_constraints
        degree = 2 * n
        w = [int(v) % Fr.p for v in inputs]
        uw = [sum(c * wi for c, wi in zip(
            [self.u_columns[j][g] for j in range(self.input_size)], w)) % Fr.p
            for g in range(n)]
        u_coeffs = ntt.interpolate_fft(Fr, Fr.array(uw))
        u_e = ntt.evaluate_offset_fft(Fr, u_coeffs, 1, degree, H_OFFSET)
        # t = x^n - 1 on the offset domain
        root = Fr.params.primitive_root_of_unity(degree.bit_length() - 1)
        t_e = ntt.powers(Fr, pow(root, n, Fr.p), degree)
        off_pow = Fr.constant(pow(H_OFFSET, n, Fr.p), (degree,))
        t_e = Fr.sub(Fr.mul(t_e, off_pow), Fr.ones((degree,)))
        t_inv = Fr.batch_inverse(t_e)
        # h = (u^2 - 1) / t + 2*delta*u + delta^2*t
        u2m1 = Fr.sub(Fr.mul(u_e, u_e), Fr.ones((degree,)))
        h_e = Fr.mul(u2m1, t_inv)
        two_delta = Fr.constant(2 * delta % Fr.p, (degree,))
        h_e = Fr.add(h_e, Fr.mul(two_delta, u_e))
        d2 = Fr.constant(delta * delta % Fr.p, (degree,))
        h_e = Fr.add(h_e, Fr.mul(d2, t_e))
        h_coeffs = ntt.interpolate_offset_fft(Fr, h_e, H_OFFSET)
        vals = [int(v) for v in Fr.to_ints(h_coeffs)]
        return vals[: n + 1]


@dataclasses.dataclass
class ProvingKey:
    k_powers_of_tau_g1: list
    u_tau_g1: list
    u_tau_g2: list
    beta_u_tau_g1: list
    t_tau_g1: object
    beta_t_tau_g1: object
    t_tau_g2: object


@dataclasses.dataclass
class VerifyingKey:
    u_tau_g1: list
    u_tau_g2: list
    t_tau_g2: object
    inv_pairing_g1_g2: object
    beta_gamma_g1: object
    gamma_g2: object


@dataclasses.dataclass
class Proof:
    h: object
    v_w: object
    v_w_prime: object
    b_w: object


def setup(ssp: SquareSpanProgram, rng=None):
    cfg = BLS12381Pairing
    rng = rng or random.Random()
    tau, beta, gamma = (rng.randrange(1, Fr.p) for _ in range(3))
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    u_tau = ssp.u_at_tau(tau)
    n, l = ssp.number_of_constraints, ssp.number_of_public_inputs
    t_tau = (pow(tau, n, Fr.p) - 1) % Fr.p

    vk = VerifyingKey(
        u_tau_g1=[g1.operate_with_self(u) for u in u_tau[:l]],
        u_tau_g2=[g2.mul(u) for u in u_tau[:l]],
        t_tau_g2=g2.mul(t_tau),
        inv_pairing_g1_g2=pairing(cfg, g1, g2).inv(),
        beta_gamma_g1=g1.operate_with_self(beta * gamma % Fr.p),
        gamma_g2=g2.mul(gamma),
    )
    pk = ProvingKey(
        k_powers_of_tau_g1=[g1.operate_with_self(pow(tau, k, Fr.p))
                            for k in range(n + 1)],
        u_tau_g1=[g1.operate_with_self(u) for u in u_tau[l:]],
        u_tau_g2=[g2.mul(u) for u in u_tau[l:]],
        beta_u_tau_g1=[g1.operate_with_self(u * beta % Fr.p)
                       for u in u_tau[l:]],
        t_tau_g1=g1.operate_with_self(t_tau),
        beta_t_tau_g1=g1.operate_with_self(beta * t_tau % Fr.p),
        t_tau_g2=g2.mul(t_tau),
    )
    return pk, vk


def _msm_g1(cfg, scalars, points):
    nz = [(s, p) for s, p in zip(scalars, points) if int(s) % Fr.p]
    if not nz:
        return cfg.g1_curve.neutral()
    s, p = zip(*nz)
    return device_msm(cfg.g1_curve, list(s), list(p))


def _msm_g2(scalars, points):
    acc = AffinePoint.infinity(points[0].field) if points else None
    for s, p in zip(scalars, points):
        if int(s) % Fr.p:
            acc = acc + p.mul(int(s) % Fr.p)
    return acc


def prove(inputs, ssp: SquareSpanProgram, pk: ProvingKey, rng=None) -> Proof:
    cfg = BLS12381Pairing
    if not ssp.check_valid(inputs):
        raise ValueError("wrong witness")
    rng = rng or random.Random()
    delta = rng.randrange(Fr.p)
    h = ssp.calculate_h_coefficients(inputs, delta)
    w = [int(v) for v in inputs[ssp.number_of_public_inputs:]]
    v_w = _msm_g1(cfg, w, pk.u_tau_g1).operate_with(
        pk.t_tau_g1.operate_with_self(delta))
    v_w_prime = _msm_g2(w, pk.u_tau_g2) + pk.t_tau_g2.mul(delta)
    b_w = _msm_g1(cfg, w, pk.beta_u_tau_g1).operate_with(
        pk.beta_t_tau_g1.operate_with_self(delta))
    return Proof(h=_msm_g1(cfg, h, pk.k_powers_of_tau_g1),
                 v_w=v_w, v_w_prime=v_w_prime, b_w=b_w)


def verify(vk: VerifyingKey, proof: Proof, pub_inputs) -> bool:
    cfg = BLS12381Pairing
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()
    ok = pairing(cfg, proof.b_w, vk.gamma_g2) == \
        pairing(cfg, vk.beta_gamma_g1, proof.v_w_prime)
    ok &= pairing(cfg, proof.v_w, g2) == pairing(cfg, g1, proof.v_w_prime)
    scalars = [int(v) for v in pub_inputs]
    v_u = _msm_g1(cfg, scalars, vk.u_tau_g1)
    v_u_prime = _msm_g2(scalars, vk.u_tau_g2)
    lhs = pairing(cfg, v_u.operate_with(proof.v_w),
                  v_u_prime + proof.v_w_prime) * vk.inv_pairing_g1_g2
    ok &= lhs == pairing(cfg, proof.h, vk.t_tau_g2)
    return ok
