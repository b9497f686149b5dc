"""Quadratic arithmetic programs (parity: ``provers/groth16/src/qap.rs``).

TPU-native twist: ``calculate_h_coefficients`` never materialises the
per-variable polynomials.  Since L(x) = sum_i w_i L_i(x) interpolates the
matvec A·w over the gate domain, the witness-scaled polynomials come from
three matvecs followed by batched device NTTs (interpolate, offset-evaluate
at double size, pointwise (L*R - O) / Z_H, interpolate back) — the same
offset-FFT pipeline as the reference (``qap.rs:15``), minus the O(vars)
polynomial loop.  The offset is 7, matching ``ORDER_R_MINUS_1_ROOT_UNITY``
(``common.rs:27``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ...poly import ntt
from .r1cs import R1CS

H_OFFSET = 7  # ORDER_R_MINUS_1_ROOT_UNITY in the reference


@dataclasses.dataclass
class QuadraticArithmeticProgram:
    field: object  # the scalar PrimeField (Fr)
    num_of_public_inputs: int
    num_of_gates: int  # padded to a power of two
    a: list  # padded R1CS rows (ints), row-major: [gate][var]
    b: list
    c: list

    @classmethod
    def from_r1cs(cls, field, r1cs: R1CS):
        n = r1cs.number_of_constraints
        padded = 1 << (n - 1).bit_length() if n > 1 else 1
        zero_row = [0] * r1cs.witness_size

        def pad(rows):
            return [list(map(int, row)) for row in rows] + \
                [list(zero_row) for _ in range(padded - n)]

        return cls(field, r1cs.number_of_inputs, padded,
                   pad(r1cs.a), pad(r1cs.b), pad(r1cs.c))

    @property
    def witness_size(self):
        return len(self.a[0])

    @property
    def num_of_private_inputs(self):
        return self.witness_size - self.num_of_public_inputs

    # ------------------------------------------------------------------
    def variable_polynomials(self):
        """L_i/R_i/O_i coefficient arrays, (K, vars, gates) device digits —
        used by setup to evaluate at tau."""
        f = self.field
        cols = lambda m: [[m[g][v] for g in range(self.num_of_gates)]
                          for v in range(self.witness_size)]
        out = []
        for m in (self.a, self.b, self.c):
            arr = f.array(cols(m))
            out.append(ntt.interpolate_fft(f, arr))
        return out

    def calculate_h_coefficients(self, witness):
        """h(x) = (L*R - O) / Z_H as host ints (``qap.rs:15``)."""
        f = self.field
        p = f.p
        w = [int(x) % p for x in witness]
        degree = self.num_of_gates * 2

        def matvec(rows):
            return [sum(coef * wi for coef, wi in zip(row, w)) % p
                    for row in rows]

        lrc = []
        for m in (self.a, self.b, self.c):
            vals = f.array(matvec(m))
            coeffs = ntt.interpolate_fft(f, vals)
            lrc.append(ntt.evaluate_offset_fft(
                f, coeffs, 1, degree, H_OFFSET))
        l_e, r_e, o_e = lrc

        # t(x) = x^num_gates - 1 evaluated on the offset domain, inverted
        t_vals = ntt.powers(f, pow(
            f.params.primitive_root_of_unity(degree.bit_length() - 1),
            self.num_of_gates, p), degree)
        off_pow = f.constant(pow(H_OFFSET, self.num_of_gates, p), (degree,))
        t_vals = f.sub(f.mul(t_vals, off_pow), f.ones((degree,)))
        t_inv = f.batch_inverse(t_vals)

        h_evals = f.mul(f.sub(f.mul(l_e, r_e), o_e), t_inv)
        h_coeffs = ntt.interpolate_offset_fft(f, h_evals, H_OFFSET)
        return [int(v) for v in f.to_ints(h_coeffs)]
