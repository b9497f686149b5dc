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
    def __init__(self, security_level: int = 128):
        self.m, self.capacity, self.round_constants, self.mds = _params(
            security_level
        )
        self.rate = self.m - self.capacity

    def _apply_mds(self, state):
        return [
            sum(r * s for r, s in zip(row, state)) % P
            for row in self.mds
        ]

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
