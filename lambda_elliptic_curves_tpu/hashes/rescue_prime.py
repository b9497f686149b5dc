"""Rescue Prime Optimized (RPO) over Goldilocks.

Parity: ``crypto/src/hash/rescue_prime/rescue_prime_optimized.rs`` —
7 full rounds of (MDS, +rc1, x^7, MDS, +rc2, x^(1/7)); security levels
128 (m=12, capacity 4) and 160 (m=16, capacity 6); sponge absorbs rate
chunks into state[capacity:], pads the last partial chunk with 1 and sets
state[0]=1, and squeezes rate/2 elements.  Round constants and MDS vectors
ship as extracted JSON data (public parameters of the published RPO spec).

Host-exact implementation (the RPO hot path belongs to Merkle layers; a
batched device version follows the same structure when wired to a
Goldilocks digit field).
"""

from __future__ import annotations

import functools
import json
import pathlib

from ..fields.zoo import Goldilocks

_CONSTANTS_PATH = pathlib.Path(__file__).parent / "rescue_prime_constants.json"

P = Goldilocks.p
ALPHA = 7
ALPHA_INV = 10540996611094048183
NUM_FULL_ROUNDS = 7


def _karatsuba(a: list, b: list) -> list:
    """Schoolbook below 8 limbs, else one Karatsuba split; coefficients of
    a(x)*b(x) (len 2m-1), reduced mod P."""
    n = len(a)
    if n <= 8:
        out = [0] * (2 * n - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % P
        return out
    h = n // 2
    a0, a1 = a[:h], a[h:]
    b0, b1 = b[:h], b[h:]
    z0 = _karatsuba(a0, b0)
    z2 = _karatsuba(a1, b1)
    amid = [(x + y) % P for x, y in zip(a0, a1)] + a1[len(a0):]
    bmid = [(x + y) % P for x, y in zip(b0, b1)] + b1[len(b0):]
    z1 = _karatsuba(amid, bmid)
    out = [0] * (2 * n - 1)
    for i, c in enumerate(z0):
        out[i] = (out[i] + c) % P
        out[i + h] = (out[i + h] - c) % P
    for i, c in enumerate(z2):
        out[i + 2 * h] = (out[i + 2 * h] + c) % P
        out[i + h] = (out[i + h] - c) % P
    for i, c in enumerate(z1):
        out[i + h] = (out[i + h] + c) % P
    return out


@functools.lru_cache(maxsize=None)
def _params(security_level: int):
    data = json.loads(_CONSTANTS_PATH.read_text())
    if security_level == 128:
        m, capacity = 12, 4
        rc = data["ROUND_CONSTANTS_128"]
        mds_vec = data["MDS_VECTOR_128"]
    elif security_level == 160:
        m, capacity = 16, 6
        rc = data["ROUND_CONSTANTS_160"]
        mds_vec = data["MDS_VECTOR_160"]
    else:
        raise ValueError("security level must be 128 or 160")
    # circulant MDS: row i is the vector rotated right by i
    mds = [[mds_vec[(j - i) % m] for j in range(m)] for i in range(m)]
    return m, capacity, rc, mds


class RescuePrimeOptimized:
    """``mds_method`` selects the MDS strategy — parity with the
    reference's ``MdsMethod`` (``rescue_prime_optimized.rs:30``):
    ``matrix_multiplication`` (naive m² products), ``ntt`` (cyclic
    convolution through a 12/16-point DFT over Goldilocks) and
    ``karatsuba`` (polynomial product mod x^m - 1).  All three are
    bit-identical; the differential test pins that."""

    def __init__(self, security_level: int = 128,
                 mds_method: str = "matrix_multiplication"):
        self.m, self.capacity, self.round_constants, self.mds = _params(
            security_level
        )
        self.rate = self.m - self.capacity
        apply = {
            "matrix_multiplication": self._mds_matrix,
            "ntt": self._mds_ntt,
            "karatsuba": self._mds_karatsuba,
        }.get(mds_method)
        if apply is None:
            raise ValueError(f"unknown mds_method {mds_method!r}")
        self._apply_mds = apply
        # circulant generator row and its reversal (for the convolution
        # forms): out_i = sum_d v[d] * s[(i+d) % m] = (s * vrev mod x^m-1)_i
        self._v = [self.mds[0][j] for j in range(self.m)]
        self._vrev = [self._v[(-e) % self.m] for e in range(self.m)]

    def _mds_matrix(self, state):
        return [
            sum(r * s for r, s in zip(row, state)) % P
            for row in self.mds
        ]

    @functools.cached_property
    def _dft_data(self):
        # primitive m-th root of unity in Goldilocks (m | p - 1)
        g = 7  # multiplicative generator of Goldilocks
        w = pow(g, (P - 1) // self.m, P)
        assert pow(w, self.m, P) == 1 and pow(w, self.m // 2, P) != 1
        vrev_hat = [
            sum(self._vrev[j] * pow(w, j * k, P) for j in range(self.m)) % P
            for k in range(self.m)
        ]
        m_inv = pow(self.m, -1, P)
        return w, vrev_hat, m_inv

    def _mds_ntt(self, state):
        w, vrev_hat, m_inv = self._dft_data
        m = self.m
        s_hat = [
            sum(state[j] * pow(w, j * k, P) for j in range(m)) % P
            for k in range(m)
        ]
        prod = [s * v % P for s, v in zip(s_hat, vrev_hat)]
        return [
            sum(prod[k] * pow(w, -i * k % (P - 1), P) for k in range(m))
            * m_inv % P
            for i in range(m)
        ]

    def _mds_karatsuba(self, state):
        prod = _karatsuba(list(state), list(self._vrev))
        m = self.m
        out = [0] * m
        for i, c in enumerate(prod):
            out[i % m] = (out[i % m] + c) % P
        return out

    def permutation(self, state):
        m = self.m
        rc = self.round_constants
        state = list(state)
        for rnd in range(NUM_FULL_ROUNDS):
            state = self._apply_mds(state)
            state = [(s + rc[rnd * 2 * m + i]) % P
                     for i, s in enumerate(state)]
            state = [pow(s, ALPHA, P) for s in state]
            state = self._apply_mds(state)
            state = [(s + rc[rnd * 2 * m + m + i]) % P
                     for i, s in enumerate(state)]
            state = [pow(s, ALPHA_INV, P) for s in state]
        return state

    def hash(self, inputs) -> list:
        """Sponge over field elements (``rescue_prime_optimized.rs:205``)."""
        vals = [int(v) % P for v in inputs]
        state = [0] * self.m
        if len(vals) % self.rate != 0:
            state[0] = 1
        full = len(vals) // self.rate
        for i in range(full):
            chunk = vals[i * self.rate:(i + 1) * self.rate]
            state[self.capacity:self.capacity + self.rate] = chunk
            state = self.permutation(state)
        rem = len(vals) % self.rate
        if rem:
            last = vals[full * self.rate:] + [0] * (self.rate - rem)
            last[rem] = 1
            state[self.capacity:self.capacity + self.rate] = last
            state = self.permutation(state)
        return state[self.capacity: self.capacity + self.rate // 2]

    def hash_bytes(self, data: bytes) -> list:
        """Bytes -> 7-byte field chunks with a 1-pad (utils.rs
        bytes_to_field_elements convention)."""
        padded = bytearray(data)
        padded.append(1)
        while len(padded) % 7:
            padded.append(0)
        elems = [int.from_bytes(padded[i:i + 7], "little")
                 for i in range(0, len(padded), 7)]
        return self.hash(elems)
