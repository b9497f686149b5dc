"""Monolith permutation over Mersenne31.

Parity: ``crypto/src/hash/monolith/mod.rs`` (itself following the published
Monolith spec): bars (8 bytewise S-box lanes via 16-bit lookups), bricks
(x_{i+1} += x_i^2), concrete (circulant MDS for width 16, Cauchy matrix
otherwise), SHAKE128-derived round constants, NUM_FULL_ROUNDS rounds with a
leading concrete.
"""

from __future__ import annotations

import functools
import hashlib

P = (1 << 31) - 1
NUM_BARS = 8

_MDS_16 = [
    61402, 17845, 26798, 59689, 12021, 40901, 41351, 27521, 56951, 12034,
    53865, 43244, 7454, 33823, 28750, 1108,
]


class _ShakeReader:
    """Streaming SHAKE128 XOF on top of hashlib (prefix property)."""

    def __init__(self, absorbed: bytes):
        self._h = hashlib.shake_128(absorbed)
        self._pos = 0
        self._buf = b""

    def read(self, n: int) -> bytes:
        while self._pos + n > len(self._buf):
            self._buf = self._h.digest(max(2 * (self._pos + n), 64))
        out = self._buf[self._pos:self._pos + n]
        self._pos += n
        return out

    def read_u32(self) -> int:
        return int.from_bytes(self.read(4), "little")


def _rotl8(y: int, r: int) -> int:
    return ((y << r) | (y >> (8 - r))) & 0xFF


def _sbox(y: int) -> int:
    t = y ^ (~_rotl8(y, 1)) & _rotl8(y, 2) & _rotl8(y, 3)
    return _rotl8(t & 0xFF, 1)


def _final_sbox(y: int) -> int:
    y_rot_1 = ((y >> 6) | (y << 1)) & 0xFF
    y_rot_2 = ((y >> 5) | (y << 2)) & 0xFF
    tmp = (y ^ (~y_rot_1) & y_rot_2) & 0x7F
    return ((tmp >> 6) | (tmp << 1)) & 0x7F


@functools.lru_cache(maxsize=None)
def _lookups():
    l1 = [((_sbox(i >> 8) << 8) | _sbox(i & 0xFF)) for i in range(1 << 16)]
    l2 = [((_final_sbox(i >> 8) << 8) | _sbox(i & 0xFF))
          for i in range(1 << 15)]
    return l1, l2


class MonolithMersenne31:
    def __init__(self, width: int = 16, num_full_rounds: int = 5):
        assert 8 <= width <= 24 and width % 4 == 0
        self.width = width
        self.rounds = num_full_rounds
        self.round_constants = self._round_constants()
        self.lookup1, self.lookup2 = _lookups()

    def _shake(self, extra: bytes) -> _ShakeReader:
        absorbed = (
            b"Monolith"
            + bytes([self.width, self.rounds + 1])
            + P.to_bytes(4, "little")
            + extra
        )
        return _ShakeReader(absorbed)

    def _round_constants(self):
        reader = self._shake(bytes([8, 8, 8, 7]))
        out = []
        for _ in range(self.rounds):
            row = []
            for _ in range(self.width):
                v = reader.read_u32()
                while v >= P:
                    v = reader.read_u32()
                row.append(v)
            out.append(row)
        return out

    # -- layers -----------------------------------------------------------
    def bars(self, state):
        for i in range(NUM_BARS):
            v = state[i]
            state[i] = (self.lookup2[v >> 16] << 16) | self.lookup1[v & 0xFFFF]
        return state

    @staticmethod
    def bricks(state):
        for i in range(len(state) - 2, -1, -1):
            state[i + 1] = (state[i + 1] + state[i] * state[i]) % P
        return state

    def concrete(self, state):
        w = self.width
        if w == 16:
            circ = list(_MDS_16)
            out = []
            for _ in range(w):
                out.append(sum(c * s for c, s in zip(circ, state)) % P)
                circ = [circ[-1]] + circ[:-1]
            return out
        reader = self._shake(bytes([16, 15]) + b"MDS")
        bits = (P - 1).bit_length()
        x_mask = (1 << (bits - 9)) - 1
        y_mask = ((1 << bits) - 1) >> 2
        ys, xs = [], []
        for i in range(w):
            y_i = reader.read_u32() & y_mask
            while any((r & x_mask) == (y_i & x_mask) for r in ys[:i]):
                y_i = reader.read_u32() & y_mask
            ys.append(y_i)
        xs = [y & x_mask for y in ys]
        out = [0] * w
        for i, x_i in enumerate(xs):
            for j, y_j in enumerate(ys):
                out[i] = (out[i] + state[j] * pow((x_i + y_j) % P, -1, P)) % P
        return out

    def permutation(self, state):
        state = self.concrete(list(state))
        for rnd in range(self.rounds):
            state = self.bars(state)
            state = self.bricks(state)
            state = self.concrete(state)
            state = [(s + rc) % P
                     for s, rc in zip(state, self.round_constants[rnd])]
        state = self.bars(state)
        state = self.bricks(state)
        state = self.concrete(state)
        return state
