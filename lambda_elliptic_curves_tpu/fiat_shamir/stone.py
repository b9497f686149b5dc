"""Stone-prover-compatible transcript (byte-exact).

Parity: ``provers/stark/src/transcript.rs:13`` — Keccak-256 counter-mode
block sampling with spare-byte reuse, seed-increment absorption, and the
Montgomery-form field element conventions of the Stone prover
(https://github.com/starkware-libs/stone-prover).  Verified against the
recorded Stone byte vectors from the reference test suite.
"""

from __future__ import annotations

from ..fields.zoo import Stark252
from ..hashes.keccak import keccak256

_P = Stark252.p
_R = 1 << 256
_R_INV = pow(_R, -1, _P)
# largest multiple of p below 2^256 (rejection bound)
MODULUS_MAX_MULTIPLE = (_R // _P) * _P


class StoneProverTranscript:
    """Drop-in IsTranscript implementation over Stark252."""

    field = Stark252

    def __init__(self, public_input_data: bytes):
        self._state = keccak256(bytes(public_input_data))
        self._seed_increment = 1
        self._counter = 0
        self._spare = b""

    # -- absorption -----------------------------------------------------
    def append_bytes(self, new_bytes: bytes):
        digest = int.from_bytes(self._state, "big")
        new_seed = ((digest + self._seed_increment) % (1 << 256)).to_bytes(
            32, "big"
        )
        self._state = keccak256(new_seed + bytes(new_bytes))
        self._counter = 0
        self._spare = b""

    def append_field_element(self, element):
        """Stone appends the MONTGOMERY form (value * 2^256 mod p) bytes."""
        value = element.value if hasattr(element, "value") else int(element)
        mont = value * _R % _P
        self.append_bytes(mont.to_bytes(32, "big"))

    def state(self) -> bytes:
        return self._state

    # -- sampling ---------------------------------------------------------
    def sample_block(self, used_bytes: int) -> bytes:
        data = self._state + b"\x00" * 28 + self._counter.to_bytes(4, "big")
        self._counter += 1
        block = keccak256(data)
        self._spare += block[used_bytes:]
        return block[:used_bytes]

    def sample(self, num_bytes: int) -> bytes:
        result = b""
        for _ in range(num_bytes // 32):
            result += self.sample_block(32)
        rest = num_bytes % 32
        if rest:
            if rest <= len(self._spare):
                result += self._spare[:rest]
                self._spare = self._spare[rest:]
            else:
                result += self.sample_block(rest)
        return result

    def sample_field_element(self):
        while True:
            value = int.from_bytes(self.sample(32), "big")
            if value < MODULUS_MAX_MULTIPLE:
                return Stark252(value * _R_INV % _P)

    def sample_u64(self, upper_bound: int) -> int:
        return int.from_bytes(self.sample(8), "big") % upper_bound

    def sample_z_ood(self, lde_coset_offset, lde_size: int,
                     trace_root_order: int):
        f = Stark252
        offset_pow = f(lde_coset_offset) ** lde_size
        trace_size = 1 << trace_root_order
        while True:
            z = self.sample_field_element()
            if (z**lde_size) != offset_pow and (z**trace_size) != f(1):
                return z
