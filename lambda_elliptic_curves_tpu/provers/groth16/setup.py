"""Groth16 trusted setup (parity: ``provers/groth16/src/setup.rs:21-61``).

Generic over the pairing configuration (the reference hardcodes BLS12-381;
``common.rs:14-20``), defaulting to BLS12-381.
"""

from __future__ import annotations

import dataclasses
import random

from ...curves.pairings import BLS12381Pairing, pairing
from ...poly import ntt
from ...poly.polynomial import evaluate_coeffs_at
from .qap import QuadraticArithmeticProgram


@dataclasses.dataclass
class VerifyingKey:
    alpha_g1_times_beta_g2: object  # pairing output (Fp12 element)
    delta_g2: object
    gamma_g2: object
    verifier_k_tau_g1: list


@dataclasses.dataclass
class ProvingKey:
    alpha_g1: object
    beta_g1: object
    beta_g2: object
    delta_g1: object
    delta_g2: object
    l_tau_g1: list
    r_tau_g1: list
    r_tau_g2: list
    prover_k_tau_g1: list
    z_powers_of_tau_g1: list


def setup(qap: QuadraticArithmeticProgram, cfg=BLS12381Pairing, rng=None):
    rng = rng or random.Random(9001)
    fr = qap.field
    tau, alpha, beta, gamma, delta = (
        rng.randrange(1, fr.p) for _ in range(5)
    )
    g1 = cfg.g1_curve.generator()
    g2 = cfg.g2_generator()

    # evaluate every variable polynomial at tau (device: one batched
    # coefficient-power dot per matrix)
    l_polys, r_polys, o_polys = qap.variable_polynomials()
    l_tau = _eval_all(fr, l_polys, tau)
    r_tau = _eval_all(fr, r_polys, tau)
    o_tau = _eval_all(fr, o_polys, tau)

    delta_inv = pow(delta, -1, fr.p)
    gamma_inv = pow(gamma, -1, fr.p)

    k_tau = []
    for i in range(qap.witness_size):
        unshifted = (beta * l_tau[i] + alpha * r_tau[i] + o_tau[i]) % fr.p
        inv = gamma_inv if i < qap.num_of_public_inputs else delta_inv
        k_tau.append(unshifted * inv % fr.p)

    alpha_g1 = g1.operate_with_self(alpha)
    beta_g2 = g2.mul(beta)
    delta_g2 = g2.mul(delta)

    n = qap.num_of_gates
    z_tau = (pow(tau, n, fr.p) - 1) % fr.p
    z_pows = []
    acc = delta_inv * z_tau % fr.p
    for _ in range(2 * n):
        z_pows.append(acc)
        acc = acc * tau % fr.p

    pk = ProvingKey(
        alpha_g1=alpha_g1,
        beta_g1=g1.operate_with_self(beta),
        beta_g2=beta_g2,
        delta_g1=g1.operate_with_self(delta),
        delta_g2=delta_g2,
        l_tau_g1=[g1.operate_with_self(v) for v in l_tau],
        r_tau_g1=[g1.operate_with_self(v) for v in r_tau],
        r_tau_g2=[g2.mul(v) for v in r_tau],
        prover_k_tau_g1=[g1.operate_with_self(v)
                         for v in k_tau[qap.num_of_public_inputs:]],
        z_powers_of_tau_g1=[g1.operate_with_self(v) for v in z_pows],
    )
    vk = VerifyingKey(
        alpha_g1_times_beta_g2=pairing(cfg, alpha_g1, beta_g2),
        delta_g2=delta_g2,
        gamma_g2=g2.mul(gamma),
        verifier_k_tau_g1=[g1.operate_with_self(v)
                           for v in k_tau[: qap.num_of_public_inputs]],
    )
    return pk, vk


def _eval_all(fr, coeff_array, tau: int):
    """(K, vars, gates) coefficient digits -> [P_i(tau)] host ints."""
    vals = evaluate_coeffs_at(fr, coeff_array, tau)  # (K, vars)
    return [int(v) for v in fr.to_ints(vals)]
