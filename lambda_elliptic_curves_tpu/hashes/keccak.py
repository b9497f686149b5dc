"""Keccak-256 (the Ethereum/Stone variant, 0x01 domain padding).

Two paths, one algorithm:

* **host**: exact pure-Python sponge for transcripts (Fiat–Shamir is a
  sequential byte protocol; it belongs on the host — parity with the
  reference's use of the ``sha3`` crate in
  ``crypto/src/fiat_shamir/default_transcript.rs:9``).
* **device**: batched keccak-f[1600] over ``(25, 2, *B)`` uint32 arrays
  (each 64-bit lane split lo/hi, since TPUs have no 64-bit integers).  One
  call hashes B independent messages — the engine behind Merkle tree
  levels (``FieldElementBackend``/batch backends,
  ``crypto/src/merkle_tree/backends/*``) and grinding searches.

Keccak-f is pure bitwise logic, an excellent VPU workload: the full 24
rounds compile to one fused elementwise loop over the batch.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp  # noqa: E402

U32 = jnp.uint32

RATE_BYTES = 136  # keccak-256 rate (1088 bits)
DIGEST_BYTES = 32

_ROUND_CONSTANTS = (
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
)

# rotation offsets r[x][y] (standard Keccak rho table, indexed [x][y])
_ROTATIONS = (
    (0, 36, 3, 41, 18),
    (1, 44, 10, 45, 2),
    (62, 6, 43, 15, 61),
    (28, 55, 25, 21, 56),
    (27, 20, 39, 8, 14),
)


# ---------------------------------------------------------------------------
# host path
# ---------------------------------------------------------------------------

def _rotl64(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & 0xFFFFFFFFFFFFFFFF


def _keccak_f_host(lanes):
    """lanes: list of 25 ints (index x + 5*y)."""
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [lanes[x] ^ lanes[x + 5] ^ lanes[x + 10] ^ lanes[x + 15] ^ lanes[x + 20]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        lanes = [lanes[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(
                    lanes[x + 5 * y], _ROTATIONS[x][y]
                )
        # chi
        lanes = [
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
            for y in range(5) for x in range(5)
        ]
        # reorder comprehension produced index y-major; rebuild x + 5y order
        lanes = [lanes[i] for i in range(25)]
        # iota
        lanes[0] ^= rc
    return lanes


def keccak256(data: bytes) -> bytes:
    """Keccak-256 of a byte string (NOT sha3-256: pad byte is 0x01).

    Dispatches to the native C implementation
    (``lambda_elliptic_curves_tpu/native/keccak.c``) when available —
    transcripts and Merkle path checks are sequential host work, native in
    the reference too (the ``sha3`` crate) — with this pure-Python sponge
    as the always-available fallback and cross-check oracle.
    """
    from .. import native

    dig = native.keccak256(data)
    if dig is not None:
        return dig
    return _keccak256_py(data)


def _keccak256_py(data: bytes) -> bytes:
    return sponge_host(data, RATE_BYTES, 0x01, DIGEST_BYTES)


def sponge_host(data: bytes, rate: int, pad_byte: int, digest_bytes: int
                ) -> bytes:
    """Generic Keccak-family sponge: Keccak-256/512 (pad 0x01) and NIST
    SHA3-256/512 (pad 0x06) differ only in rate and domain padding."""
    lanes = [0] * 25
    padded = bytearray(data)
    padded.append(pad_byte)
    while len(padded) % rate:
        padded.append(0x00)
    padded[-1] ^= 0x80
    for block_start in range(0, len(padded), rate):
        block = padded[block_start : block_start + rate]
        for i in range(rate // 8):
            lanes[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        lanes = _keccak_f_host(lanes)
    out = b"".join(
        lane.to_bytes(8, "little")
        for lane in lanes[: (digest_bytes + 7) // 8]
    )
    return out[:digest_bytes]


def keccak512(data: bytes) -> bytes:
    """Legacy Keccak-512 (rate 72, pad 0x01) — ``Keccak512Backend``
    (``crypto/src/merkle_tree/backends/types.rs``)."""
    return sponge_host(data, 72, 0x01, 64)


# ---------------------------------------------------------------------------
# device path (batched)
# ---------------------------------------------------------------------------

def _rotl64_pair(lo, hi, n: int):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return (
            (lo << n) | (hi >> (32 - n)),
            (hi << n) | (lo >> (32 - n)),
        )
    m = n - 32
    return (
        (hi << m) | (lo >> (32 - m)),
        (lo << m) | (hi >> (32 - m)),
    )


_RC_TAB = np.array(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in _ROUND_CONSTANTS], np.uint32
)


def keccak_f(state):
    """Batched keccak-f[1600]: state (25, 2, *B) uint32, [.,0]=lo, [.,1]=hi.

    Dispatch: large batches on TPU route to the VMEM-resident Pallas
    kernel (:mod:`.keccak_pallas` — one HBM read/write instead of one per
    round); everything else runs the XLA ``fori_loop`` below.  The pallas
    module probes its own availability once and self-disables on Mosaic
    lowering failures, so this dispatch is always safe."""
    from . import keccak_pallas

    if keccak_pallas.available(state.shape[2:]):
        return keccak_pallas.keccak_f(state)
    return _keccak_f_xla(state)


def _keccak_f_xla(state):
    """The XLA formulation: one round is ~350 elementwise ops; the 24
    rounds run as a ``fori_loop`` (round constants indexed from a table)
    so the compiled graph holds a single round body."""
    import jax

    rc_tab = jnp.asarray(_RC_TAB)

    def round_body(r, st):
        lanes = [(st[i, 0], st[i, 1]) for i in range(25)]
        c = []
        for x in range(5):
            lo = lanes[x][0] ^ lanes[x + 5][0] ^ lanes[x + 10][0] ^ lanes[x + 15][0] ^ lanes[x + 20][0]
            hi = lanes[x][1] ^ lanes[x + 5][1] ^ lanes[x + 10][1] ^ lanes[x + 15][1] ^ lanes[x + 20][1]
            c.append((lo, hi))
        d = []
        for x in range(5):
            rl, rh = _rotl64_pair(*c[(x + 1) % 5], 1)
            d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
        lanes = [(lanes[i][0] ^ d[i % 5][0], lanes[i][1] ^ d[i % 5][1])
                 for i in range(25)]
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64_pair(
                    *lanes[x + 5 * y], _ROTATIONS[x][y]
                )
        lanes = [
            (
                b[x + 5 * y][0] ^ (~b[(x + 1) % 5 + 5 * y][0] & b[(x + 2) % 5 + 5 * y][0]),
                b[x + 5 * y][1] ^ (~b[(x + 1) % 5 + 5 * y][1] & b[(x + 2) % 5 + 5 * y][1]),
            )
            for y in range(5) for x in range(5)
        ]
        rc = jax.lax.dynamic_index_in_dim(rc_tab, r, 0, keepdims=False)
        lanes[0] = (lanes[0][0] ^ rc[0], lanes[0][1] ^ rc[1])
        return jnp.stack([jnp.stack([lo, hi]) for lo, hi in lanes])

    return jax.lax.fori_loop(0, len(_ROUND_CONSTANTS), round_body, state)


@functools.lru_cache(maxsize=64)
def _jitted_sponge_words(msg_bytes: int, rate: int, pad_byte: int,
                         digest_bytes: int):
    import jax

    return jax.jit(lambda words: _sponge_words_impl(
        words, msg_bytes, rate, pad_byte, digest_bytes))


def keccak256_words(words, msg_bytes: int):
    """Batched keccak-256 of fixed-size messages (jit-cached per size).

    ``words``: (W, *B) uint32, the messages as little-endian 32-bit words
    (W*4 >= msg_bytes; trailing bytes of the last word must be zero).
    Returns (8, *B) uint32 — the 32-byte digests as LE words.
    """
    return _jitted_sponge_words(int(msg_bytes), RATE_BYTES, 0x01, 32)(words)


def sponge_words(words, msg_bytes: int, rate: int, pad_byte: int,
                 digest_bytes: int):
    """Batched generic Keccak-family sponge (keccak-256/512, sha3-256/512:
    rate/padding vary, the permutation doesn't).  Same word layout contract
    as :func:`keccak256_words`; returns (digest_bytes/4, *B) LE words."""
    return _jitted_sponge_words(int(msg_bytes), int(rate), int(pad_byte),
                                int(digest_bytes))(words)


def _sponge_words_impl(words, msg_bytes: int, rate: int, pad_byte: int,
                       digest_bytes: int):
    batch = words.shape[1:]
    rate_words = rate // 4
    rate_lanes = rate // 8
    nblocks = msg_bytes // rate + 1
    padded_words = nblocks * rate_words
    # size the zero-pad from the *message* word count, not the caller's
    # array: extra trailing words (allowed by the contract as long as the
    # message bytes are exact) must not shrink the pad
    msg_words = msg_bytes // 4 + (1 if msg_bytes % 4 else 0)
    msg = words[:msg_words]
    pad = jnp.zeros((padded_words - msg_words,) + batch, U32)
    full = jnp.concatenate([msg, pad], axis=0)
    # padding bytes: domain byte after the message, 0x80 at the block end
    full = full.at[msg_bytes // 4].add(
        U32(pad_byte) << U32(8 * (msg_bytes % 4)))
    full = full.at[padded_words - 1].add(U32(0x80) << U32(24))

    state = jnp.zeros((25, 2) + tuple(batch), U32)
    for blk in range(nblocks):
        block = full[blk * rate_words : (blk + 1) * rate_words]
        lanes = state
        upd = jnp.stack([
            jnp.stack([block[2 * i], block[2 * i + 1]])
            for i in range(rate_lanes)
        ])
        lanes = lanes.at[:rate_lanes].set(lanes[:rate_lanes] ^ upd)
        state = keccak_f(lanes)
    return jnp.concatenate(
        [state[i] for i in range((digest_bytes + 7) // 8)], axis=0
    )[: digest_bytes // 4]


def digest_words_to_bytes(words) -> list[bytes]:
    """(8, B) uint32 LE digest words -> list of 32-byte digests."""
    from ..ops.limbs import device_to_np

    arr = device_to_np(words)
    flat = np.ascontiguousarray(arr.reshape(8, -1).T.astype("<u4"))
    buf = flat.tobytes()  # B contiguous 32-byte digests
    return [buf[32 * b: 32 * b + 32] for b in range(flat.shape[0])]


def bytes_to_digest_words(digests: list[bytes]):
    """Inverse of digest_words_to_bytes."""
    buf = b"".join(digests)
    arr = np.frombuffer(buf, dtype="<u4").reshape(len(digests), 8).T
    return jnp.asarray(np.ascontiguousarray(arr))
