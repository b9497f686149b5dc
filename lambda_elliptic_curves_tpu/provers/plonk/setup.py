"""Plonk preprocessing (parity: ``provers/plonk/src/setup.rs``)."""

from __future__ import annotations

import dataclasses

from ...fields.element import FieldElement
from ...poly.polynomial import Polynomial
from .constraint_system import ConstraintSystem, get_permutation


@dataclasses.dataclass
class Witness:
    a: list
    b: list
    c: list

    @classmethod
    def new(cls, values: dict, system: ConstraintSystem):
        lro, _ = system.to_matrices()
        abc = [values[v] for v in lro]
        n = len(lro) // 3
        return cls(a=abc[:n], b=abc[n:2 * n], c=abc[2 * n:])


@dataclasses.dataclass
class CommonPreprocessedInput:
    n: int
    field: object
    domain: list
    omega: FieldElement
    k1: FieldElement
    ql: Polynomial
    qr: Polynomial
    qo: Polynomial
    qm: Polynomial
    qc: Polynomial
    s1: Polynomial
    s2: Polynomial
    s3: Polynomial
    s1_lagrange: list
    s2_lagrange: list
    s3_lagrange: list

    @classmethod
    def from_constraint_system(cls, system: ConstraintSystem,
                               order_r_minus_1_root_unity):
        f = system.field
        u = f(order_r_minus_1_root_unity)
        lro, q = system.to_matrices()
        n = len(lro) // 3
        omega = f(f.params.primitive_root_of_unity(n.bit_length() - 1))
        domain = _powers(omega, n)

        m = len(q) // 5
        ql, qr, qm, qo, qc = (q[i * m:(i + 1) * m] for i in range(5))

        permutation = get_permutation(lro)
        identity = [w * u**col for col in range(3) for w in domain]
        permuted = [identity[permutation[i]] for i in range(3 * n)]

        interp = lambda vals: _interpolate_fft(f, vals)
        return cls(
            n=n, field=f, domain=domain, omega=omega, k1=u,
            ql=interp(ql), qr=interp(qr), qm=interp(qm), qo=interp(qo),
            qc=interp(qc),
            s1=interp(permuted[:n]), s2=interp(permuted[n:2 * n]),
            s3=interp(permuted[2 * n:]),
            s1_lagrange=permuted[:n], s2_lagrange=permuted[n:2 * n],
            s3_lagrange=permuted[2 * n:],
        )


@dataclasses.dataclass
class VerificationKey:
    qm_1: object
    ql_1: object
    qr_1: object
    qo_1: object
    qc_1: object
    s1_1: object
    s2_1: object
    s3_1: object

    def commitments(self):
        return [self.qm_1, self.ql_1, self.qr_1, self.qo_1, self.qc_1,
                self.s1_1, self.s2_1, self.s3_1]


def setup(common_input: CommonPreprocessedInput, commitment_scheme):
    return VerificationKey(
        qm_1=commitment_scheme.commit(common_input.qm),
        ql_1=commitment_scheme.commit(common_input.ql),
        qr_1=commitment_scheme.commit(common_input.qr),
        qo_1=commitment_scheme.commit(common_input.qo),
        qc_1=commitment_scheme.commit(common_input.qc),
        s1_1=commitment_scheme.commit(common_input.s1),
        s2_1=commitment_scheme.commit(common_input.s2),
        s3_1=commitment_scheme.commit(common_input.s3),
    )


def new_strong_fiat_shamir_transcript(field, vk: VerificationKey,
                                      public_input):
    """Strong FS init: absorb the VK and the public inputs (setup.rs:133)."""
    from ...fiat_shamir import DefaultTranscript

    t = DefaultTranscript(field)
    for commitment in vk.commitments():
        t.append_bytes(point_to_bytes(commitment))
    for value in public_input:
        t.append_field_element(value)
    return t


def point_to_bytes(pt) -> bytes:
    """Uncompressed x||y big-endian affine encoding; infinity = zeros."""
    aff = pt.to_affine()
    nb = pt.curve.field.params.num_bytes
    if aff.z == 0:
        return b"\x00" * (2 * nb)
    return aff.x.to_bytes(nb, "big") + aff.y.to_bytes(nb, "big")


# -- small host<->device FFT helpers ------------------------------------------

def _interpolate_fft(field, values) -> Polynomial:
    from ...poly import ntt

    vals = [v.value if isinstance(v, FieldElement) else int(v)
            for v in values]
    coeffs = ntt.interpolate_fft(field, field.array(vals))
    return Polynomial(field, [int(v) for v in field.to_ints(coeffs)])


def _powers(base: FieldElement, count: int) -> list:
    out, acc = [], base.field(1)
    for _ in range(count):
        out.append(acc)
        acc = acc * base
    return out
