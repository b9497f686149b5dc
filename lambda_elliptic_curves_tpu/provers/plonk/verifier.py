"""Plonk verifier (parity: ``provers/plonk/src/verifier.rs:64``)."""

from __future__ import annotations

from .prover import Proof
from .setup import (
    CommonPreprocessedInput, VerificationKey,
    new_strong_fiat_shamir_transcript, point_to_bytes,
)


class Verifier:
    def __init__(self, commitment_scheme):
        self.cs = commitment_scheme

    def _compute_challenges(self, p: Proof, vk: VerificationKey,
                            field, public_input):
        t = new_strong_fiat_shamir_transcript(field, vk, public_input)
        for cm in (p.a_1, p.b_1, p.c_1):
            t.append_bytes(point_to_bytes(cm))
        beta = t.sample_field_element()
        gamma = t.sample_field_element()
        t.append_bytes(point_to_bytes(p.z_1))
        alpha = t.sample_field_element()
        for cm in (p.t_lo_1, p.t_mid_1, p.t_hi_1):
            t.append_bytes(point_to_bytes(cm))
        zeta = t.sample_field_element()
        for v in (p.a_zeta, p.b_zeta, p.c_zeta, p.s1_zeta, p.s2_zeta,
                  p.z_zeta_omega):
            t.append_field_element(v)
        upsilon = t.sample_field_element()
        return beta, gamma, alpha, zeta, upsilon

    def verify(self, p: Proof, public_input,
               cpi: CommonPreprocessedInput, vk: VerificationKey) -> bool:
        f = cpi.field
        beta, gamma, alpha, zeta, upsilon = self._compute_challenges(
            p, vk, f, public_input
        )
        n = cpi.n
        zh_zeta = zeta**n - f(1)
        k1, k2 = cpi.k1, cpi.k1 * cpi.k1
        l1_zeta = (zeta**n - f(1)) / (zeta - f(1)) / f(n)

        # PI(zeta) without interpolating (verifier.rs:90)
        if public_input:
            pi_zeta = l1_zeta * public_input[0]
            li = l1_zeta
            for i in range(1, len(public_input)):
                li = cpi.omega * li * (zeta - cpi.domain[i - 1]) \
                    / (zeta - cpi.domain[i])
                pi_zeta = pi_zeta + public_input[i] * li
        else:
            pi_zeta = f(0)

        p_constant_zeta = alpha * p.z_zeta_omega * (p.c_zeta + gamma) \
            * (p.a_zeta + beta * p.s1_zeta + gamma) \
            * (p.b_zeta + beta * p.s2_zeta + gamma)
        p_constant_zeta = p_constant_zeta - l1_zeta * alpha * alpha
        p_constant_zeta = p_constant_zeta + pi_zeta

        p_zeta = p_constant_zeta + p.p_non_constant_zeta
        if not (p_zeta - zh_zeta * p.t_zeta).is_zero():
            return False

        partial_t_1 = p.t_lo_1 \
            .operate_with(p.t_mid_1.operate_with_self(int(zeta**(n + 2)))) \
            .operate_with(p.t_hi_1.operate_with_self(int(zeta**(2 * n + 4))))

        first = vk.qm_1.operate_with_self(int(p.a_zeta * p.b_zeta)) \
            .operate_with(vk.ql_1.operate_with_self(int(p.a_zeta))) \
            .operate_with(vk.qr_1.operate_with_self(int(p.b_zeta))) \
            .operate_with(vk.qo_1.operate_with_self(int(p.c_zeta))) \
            .operate_with(vk.qc_1)

        z_coeff = -(p.a_zeta + beta * zeta + gamma) \
            * (p.b_zeta + beta * k1 * zeta + gamma) \
            * (p.c_zeta + beta * k2 * zeta + gamma)
        s3_coeff = (p.a_zeta + beta * p.s1_zeta + gamma) \
            * (p.b_zeta + beta * p.s2_zeta + gamma) * beta * p.z_zeta_omega
        second = p.z_1.operate_with_self(int(z_coeff)) \
            .operate_with(vk.s3_1.operate_with_self(int(s3_coeff))) \
            .operate_with_self(int(alpha))
        third = p.z_1.operate_with_self(int(alpha * alpha * l1_zeta))

        p_non_constant_1 = first.operate_with(second).operate_with(third)

        ys = [p.t_zeta, p.p_non_constant_zeta, p.a_zeta, p.b_zeta,
              p.c_zeta, p.s1_zeta, p.s2_zeta]
        commitments = [partial_t_1, p_non_constant_1, p.a_1, p.b_1, p.c_1,
                       vk.s1_1, vk.s2_1]
        if not self.cs.verify_batch(zeta, ys, commitments, p.w_zeta_1,
                                    upsilon):
            return False
        return self.cs.verify(zeta * cpi.omega, p.z_zeta_omega, p.z_1,
                              p.w_zeta_omega_1)
