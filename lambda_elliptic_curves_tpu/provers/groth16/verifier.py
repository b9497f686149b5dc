"""Groth16 verifier (parity: ``provers/groth16/src/verifier.rs:7``):
e(pi3, delta_g2) * e(alpha, beta) * e(K_pub(w), gamma_g2) == e(pi1, pi2)."""

from __future__ import annotations

from ...curves.msm import msm as device_msm
from ...curves.pairings import BLS12381Pairing, pairing
from .prover import Proof
from .setup import VerifyingKey


def verify(vk: VerifyingKey, proof: Proof, pub_inputs, cfg=BLS12381Pairing) -> bool:
    scalars = [int(x) for x in pub_inputs]
    nontrivial = [(s, p) for s, p in
                  zip(scalars, vk.verifier_k_tau_g1) if s]
    if nontrivial:
        s, p = zip(*nontrivial)
        k_pub = device_msm(cfg.g1_curve, list(s), list(p))
    else:
        k_pub = cfg.g1_curve.neutral()

    lhs = pairing(cfg, proof.pi3, vk.delta_g2) \
        * vk.alpha_g1_times_beta_g2 \
        * pairing(cfg, k_pub, vk.gamma_g2)
    rhs = pairing(cfg, proof.pi1, proof.pi2)
    return lhs == rhs
