"""Groth16 prover (parity: ``provers/groth16/src/prover.rs:68``):
h(tau) via offset NTTs + five MSMs — pi_2's G2 MSM runs the same device
Pippenger pipeline over flat Fp2 digit arrays — with (r, s) hiding
randomness."""

from __future__ import annotations

import dataclasses
import random

from ...curves.msm import msm as device_msm, msm_naive_host
from ...curves.pairings import AffinePoint, BLS12381Pairing
from ...curves import twists
from .qap import QuadraticArithmeticProgram
from .setup import ProvingKey

_TWISTS = {
    "bls12_381": twists.bls12_381_twist,
    "bn254": twists.bn254_twist,
    "bls12_377": twists.bls12_377_twist,
}


@dataclasses.dataclass
class Proof:
    pi1: object  # G1
    pi2: object  # G2 (AffinePoint over Fp2)
    pi3: object  # G1

    def serialize(self) -> bytes:
        """Length-prefixed uncompressed points (``prover.rs:14`` role)."""
        out = bytearray()
        for pt in (self.pi1, self.pi3):
            aff = pt.to_affine()
            nb = pt.curve.field.params.num_bytes
            blob = aff.x.to_bytes(nb, "big") + aff.y.to_bytes(nb, "big")
            out += len(blob).to_bytes(4, "big") + blob
        x, y = self.pi2.x.value, self.pi2.y.value
        nb = self.pi2.field.prime_field().params.num_bytes
        blob = b"".join(int(c).to_bytes(nb, "big") for c in (*x, *y))
        out += len(blob).to_bytes(4, "big") + blob
        return bytes(out)

    @classmethod
    def deserialize(cls, data: bytes, cfg=None) -> "Proof":
        """Inverse of :meth:`serialize` (``prover.rs:29`` parity);
        validates each point against its curve equation on construction."""
        from ...utils.errors import DeserializationError

        cfg = cfg or BLS12381Pairing
        blobs = []
        pos = 0
        for _ in range(3):
            if pos + 4 > len(data):
                raise DeserializationError("groth16 proof truncated")
            ln = int.from_bytes(data[pos: pos + 4], "big")
            pos += 4
            if pos + ln > len(data):
                raise DeserializationError("groth16 proof truncated")
            blobs.append(data[pos: pos + ln])
            pos += ln
        nb = cfg.g1_curve.field.params.num_bytes
        g1_pts = []
        for blob in blobs[:2]:
            if len(blob) != 2 * nb:
                raise DeserializationError("bad G1 length")
            g1_pts.append(cfg.g1_curve.point(
                int.from_bytes(blob[:nb], "big"),
                int.from_bytes(blob[nb:], "big")))
        blob = blobs[2]
        if len(blob) != 4 * nb:
            raise DeserializationError("bad G2 length")
        comps = [int.from_bytes(blob[i * nb:(i + 1) * nb], "big")
                 for i in range(4)]
        fp2 = cfg.fp2
        pi2 = AffinePoint(fp2, fp2((comps[0], comps[1])),
                          fp2((comps[2], comps[3])))
        return cls(pi1=g1_pts[0], pi2=pi2, pi3=g1_pts[1])


def _msm_g1(cfg, scalars, points):
    nontrivial = [(s, p) for s, p in zip(scalars, points) if int(s)]
    if not nontrivial:
        return cfg.g1_curve.neutral()
    s, p = zip(*nontrivial)
    return device_msm(cfg.g1_curve, list(s), list(p))


def _msm_g2(cfg, scalars, points):
    """G2 MSM through the device Pippenger pipeline (``prover.rs:68``'s
    pi_2 MSM; generic bucket method per ``pippenger.rs:19``)."""
    nontrivial = [(s, p) for s, p in zip(scalars, points) if int(s)]
    if not nontrivial:
        return AffinePoint.infinity(points[0].field)
    s, p = zip(*nontrivial)
    twist = _TWISTS[cfg.name]()
    return device_msm(twist, list(s), list(p))


def prove(witness, qap: QuadraticArithmeticProgram, pk: ProvingKey,
          cfg=BLS12381Pairing, rng=None) -> Proof:
    rng = rng or random.Random()
    fr = qap.field
    w = [int(x) % fr.p for x in witness]

    h = qap.calculate_h_coefficients(w)

    r = rng.randrange(fr.p)
    s = rng.randrange(fr.p)

    pi1 = _msm_g1(cfg, w, pk.l_tau_g1) \
        .operate_with(pk.alpha_g1) \
        .operate_with(pk.delta_g1.operate_with_self(r))

    pi2 = _msm_g2(cfg, w, pk.r_tau_g2) + pk.beta_g2 + \
        pk.delta_g2.mul(s)

    t_h_g1 = _msm_g1(cfg, h, pk.z_powers_of_tau_g1[: len(h)])
    k_priv_g1 = _msm_g1(cfg, w[qap.num_of_public_inputs:],
                        pk.prover_k_tau_g1[: qap.num_of_private_inputs])

    pi2_g1 = _msm_g1(cfg, w, pk.r_tau_g1) \
        .operate_with(pk.beta_g1) \
        .operate_with(pk.delta_g1.operate_with_self(s))

    pi3 = k_priv_g1 \
        .operate_with(t_h_g1) \
        .operate_with(pi1.operate_with_self(s)) \
        .operate_with(pi2_g1.operate_with_self(r)) \
        .operate_with(pk.delta_g1.operate_with_self((-r * s) % cfg.r))

    return Proof(pi1=pi1, pi2=pi2, pi3=pi3)
