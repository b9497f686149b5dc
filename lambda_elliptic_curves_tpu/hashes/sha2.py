"""Batched device SHA-256 / SHA-512 (Merkle digest backends).

Parity: the reference's digest-generic Merkle backends instantiate the
RustCrypto ``sha2`` crate (``Sha2_256Backend``/``Sha2_512Backend``,
``crypto/src/merkle_tree/backends/types.rs``).  Host hashing is stdlib
``hashlib``; the device path here hashes B independent fixed-size messages
per call, exactly like :mod:`.keccak`'s batched sponge.

Word layout contract (shared with keccak.py): messages and digests travel
as **little-endian 32-bit words of the byte stream** — the universal device
node format of the Merkle backends.  SHA-2 itself is big-endian, so words
are byte-swapped at the boundary.

SHA-256 is pure u32 arithmetic — a perfect VPU fit.  SHA-512 runs on
(lo, hi) u32 pairs (TPUs have no 64-bit ints) with explicit carry adds.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32

_K256 = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], np.uint32)

_H256 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], np.uint32)

_K512 = [
    0x428a2f98d728ae22, 0x7137449123ef65cd, 0xb5c0fbcfec4d3b2f,
    0xe9b5dba58189dbbc, 0x3956c25bf348b538, 0x59f111f1b605d019,
    0x923f82a4af194f9b, 0xab1c5ed5da6d8118, 0xd807aa98a3030242,
    0x12835b0145706fbe, 0x243185be4ee4b28c, 0x550c7dc3d5ffb4e2,
    0x72be5d74f27b896f, 0x80deb1fe3b1696b1, 0x9bdc06a725c71235,
    0xc19bf174cf692694, 0xe49b69c19ef14ad2, 0xefbe4786384f25e3,
    0x0fc19dc68b8cd5b5, 0x240ca1cc77ac9c65, 0x2de92c6f592b0275,
    0x4a7484aa6ea6e483, 0x5cb0a9dcbd41fbd4, 0x76f988da831153b5,
    0x983e5152ee66dfab, 0xa831c66d2db43210, 0xb00327c898fb213f,
    0xbf597fc7beef0ee4, 0xc6e00bf33da88fc2, 0xd5a79147930aa725,
    0x06ca6351e003826f, 0x142929670a0e6e70, 0x27b70a8546d22ffc,
    0x2e1b21385c26c926, 0x4d2c6dfc5ac42aed, 0x53380d139d95b3df,
    0x650a73548baf63de, 0x766a0abb3c77b2a8, 0x81c2c92e47edaee6,
    0x92722c851482353b, 0xa2bfe8a14cf10364, 0xa81a664bbc423001,
    0xc24b8b70d0f89791, 0xc76c51a30654be30, 0xd192e819d6ef5218,
    0xd69906245565a910, 0xf40e35855771202a, 0x106aa07032bbd1b8,
    0x19a4c116b8d2d0c8, 0x1e376c085141ab53, 0x2748774cdf8eeb99,
    0x34b0bcb5e19b48a8, 0x391c0cb3c5c95a63, 0x4ed8aa4ae3418acb,
    0x5b9cca4f7763e373, 0x682e6ff3d6b2b8a3, 0x748f82ee5defb2fc,
    0x78a5636f43172f60, 0x84c87814a1f0ab72, 0x8cc702081a6439ec,
    0x90befffa23631e28, 0xa4506cebde82bde9, 0xbef9a3f7b2c67915,
    0xc67178f2e372532b, 0xca273eceea26619c, 0xd186b8c721c0c207,
    0xeada7dd6cde0eb1e, 0xf57d4f7fee6ed178, 0x06f067aa72176fba,
    0x0a637dc5a2c898a6, 0x113f9804bef90dae, 0x1b710b35131c471b,
    0x28db77f523047d84, 0x32caab7b40c72493, 0x3c9ebe0a15c9bebc,
    0x431d67c49c100d4c, 0x4cc5d4becb3e42b6, 0x597f299cfc657e2a,
    0x5fcb6fab3ad6faec, 0x6c44198c4a475817,
]

_H512 = [
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
    0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
    0x1f83d9abfb41bd6b, 0x5be0cd19137e2179,
]


def _bswap32(x):
    return (
        ((x & U32(0xFF)) << U32(24))
        | ((x & U32(0xFF00)) << U32(8))
        | ((x >> U32(8)) & U32(0xFF00))
        | (x >> U32(24))
    )


def _rotr32(x, n: int):
    return (x >> U32(n)) | (x << U32(32 - n))


def _pad_be_words(words, msg_bytes: int, block_bytes: int, len_words: int):
    """LE stream words -> padded big-endian 32-bit words (batch preserved).

    ``len_words``: how many trailing 32-bit words the length field uses
    (2 for SHA-256's 64-bit length, 4 for SHA-512's 128-bit length)."""
    batch = words.shape[1:]
    nblocks = (msg_bytes + 1 + 4 * len_words + block_bytes - 1) // block_bytes
    total_words = nblocks * (block_bytes // 4)
    msg_words = msg_bytes // 4 + (1 if msg_bytes % 4 else 0)
    pad = jnp.zeros((total_words - msg_words,) + batch, U32)
    full = jnp.concatenate([words[:msg_words], pad], axis=0)
    be = _bswap32(full)
    # 0x80 pad byte straight into the BE view (top-down byte order)
    be = be.at[msg_bytes // 4].add(U32(0x80) << U32(8 * (3 - msg_bytes % 4)))
    bitlen = msg_bytes * 8
    be = be.at[total_words - 1].add(U32(bitlen & 0xFFFFFFFF))
    if bitlen >> 32:
        be = be.at[total_words - 2].add(U32(bitlen >> 32))
    return be, nblocks


@functools.lru_cache(maxsize=64)
def _jitted_sha256_words(msg_bytes: int):
    import jax

    return jax.jit(lambda words: _sha256_words_impl(words, msg_bytes))


def sha256_words(words, msg_bytes: int):
    """Batched SHA-256: (W, *B) LE stream words -> (8, *B) LE digest words."""
    return _jitted_sha256_words(int(msg_bytes))(words)


def _sha256_words_impl(words, msg_bytes: int):
    """Message schedule and rounds run as ``fori_loop``s (one round body in
    the compiled graph — a fully unrolled 64-round program is a multi-minute
    XLA CPU compile on the 1-core test hosts)."""
    import jax

    batch = words.shape[1:]
    be, nblocks = _pad_be_words(words, msg_bytes, 64, 2)
    k_tab = jnp.asarray(_K256)
    h = jnp.stack([jnp.broadcast_to(U32(int(v)), batch) for v in _H256])

    def one_block(h, block):
        w0 = jnp.concatenate(
            [block, jnp.zeros((48,) + batch, U32)], axis=0)

        def sched(i, w):
            a15 = jax.lax.dynamic_index_in_dim(w, i - 15, 0, keepdims=False)
            a2 = jax.lax.dynamic_index_in_dim(w, i - 2, 0, keepdims=False)
            a16 = jax.lax.dynamic_index_in_dim(w, i - 16, 0, keepdims=False)
            a7 = jax.lax.dynamic_index_in_dim(w, i - 7, 0, keepdims=False)
            s0 = _rotr32(a15, 7) ^ _rotr32(a15, 18) ^ (a15 >> U32(3))
            s1 = _rotr32(a2, 17) ^ _rotr32(a2, 19) ^ (a2 >> U32(10))
            return jax.lax.dynamic_update_index_in_dim(
                w, a16 + s0 + a7 + s1, i, 0)

        w = jax.lax.fori_loop(16, 64, sched, w0)

        def rnd(i, st):
            a, b, c, d, e, f, g, hh = [st[j] for j in range(8)]
            s1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
            ch = (e & f) ^ (~e & g)
            wi = jax.lax.dynamic_index_in_dim(w, i, 0, keepdims=False)
            ki = jax.lax.dynamic_index_in_dim(k_tab, i, 0, keepdims=False)
            t1 = hh + s1 + ch + ki + wi
            s0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0 + maj
            return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g])

        st = jax.lax.fori_loop(0, 64, rnd, h)
        return h + st

    for blk in range(nblocks):
        h = one_block(h, be[16 * blk : 16 * (blk + 1)])
    return _bswap32(h)


# ---------------------------------------------------------------------------
# SHA-512 on (lo, hi) u32 pairs
# ---------------------------------------------------------------------------

def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    return lo, a[1] + b[1] + carry


def _xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def _rotr64(x, n: int):
    # rotr(n) == rotl(64-n); pairs are (lo, hi)
    from .keccak import _rotl64_pair

    return _rotl64_pair(x[0], x[1], (64 - n) % 64)


def _shr64(x, n: int):
    if n < 32:
        if n == 0:
            return x
        return (x[0] >> U32(n)) | (x[1] << U32(32 - n)), x[1] >> U32(n)
    return x[1] >> U32(n - 32) if n > 32 else x[1], jnp.zeros_like(x[1])


@functools.lru_cache(maxsize=64)
def _jitted_sha512_words(msg_bytes: int):
    import jax

    return jax.jit(lambda words: _sha512_words_impl(words, msg_bytes))


def sha512_words(words, msg_bytes: int):
    """Batched SHA-512: (W, *B) LE stream words -> (16, *B) LE digest words."""
    return _jitted_sha512_words(int(msg_bytes))(words)


def _sha512_words_impl(words, msg_bytes: int):
    """Same ``fori_loop`` structure as SHA-256; 64-bit words travel as a
    leading (lo, hi) axis of u32 planes."""
    import jax

    batch = words.shape[1:]
    be, nblocks = _pad_be_words(words, msg_bytes, 128, 4)
    k_tab = jnp.asarray(np.array(
        [[v & 0xFFFFFFFF, v >> 32] for v in _K512], np.uint32))
    h = jnp.stack([
        jnp.stack([jnp.broadcast_to(U32(v & 0xFFFFFFFF), batch),
                   jnp.broadcast_to(U32(v >> 32), batch)])
        for v in _H512
    ])  # (8, 2, *batch)

    def pair(arr, i):
        v = jax.lax.dynamic_index_in_dim(arr, i, 0, keepdims=False)
        return v[0], v[1]

    def one_block(h, block):
        # 64-bit word j: hi = block[2j], lo = block[2j+1]
        w0 = jnp.stack(
            [jnp.stack([block[2 * j + 1], block[2 * j]]) for j in range(16)]
            + [jnp.zeros((2,) + batch, U32)] * 64)

        def sched(i, w):
            a15 = pair(w, i - 15)
            a2 = pair(w, i - 2)
            s0 = _xor64(_xor64(_rotr64(a15, 1), _rotr64(a15, 8)),
                        _shr64(a15, 7))
            s1 = _xor64(_xor64(_rotr64(a2, 19), _rotr64(a2, 61)),
                        _shr64(a2, 6))
            v = _add64(_add64(pair(w, i - 16), s0),
                       _add64(pair(w, i - 7), s1))
            return jax.lax.dynamic_update_index_in_dim(
                w, jnp.stack(v), i, 0)

        w = jax.lax.fori_loop(16, 80, sched, w0)

        def rnd(i, st):
            a, b, c, d, e, f, g, hh = [(st[j, 0], st[j, 1])
                                       for j in range(8)]
            s1 = _xor64(_xor64(_rotr64(e, 14), _rotr64(e, 18)),
                        _rotr64(e, 41))
            ch = (
                (e[0] & f[0]) ^ (~e[0] & g[0]),
                (e[1] & f[1]) ^ (~e[1] & g[1]),
            )
            ki = pair(k_tab.reshape(80, 2, *([1] * len(batch))), i)
            wi = pair(w, i)
            t1 = _add64(_add64(_add64(hh, s1), _add64(ch, ki)), wi)
            s0 = _xor64(_xor64(_rotr64(a, 28), _rotr64(a, 34)),
                        _rotr64(a, 39))
            maj = (
                (a[0] & b[0]) ^ (a[0] & c[0]) ^ (b[0] & c[0]),
                (a[1] & b[1]) ^ (a[1] & c[1]) ^ (b[1] & c[1]),
            )
            t2 = _add64(s0, maj)
            new = [_add64(t1, t2), a, b, c, _add64(d, t1), e, f, g]
            return jnp.stack([jnp.stack(v) for v in new])

        st = jax.lax.fori_loop(0, 80, rnd, h)
        return jnp.stack([
            jnp.stack(_add64((h[j, 0], h[j, 1]), (st[j, 0], st[j, 1])))
            for j in range(8)
        ])

    for blk in range(nblocks):
        h = one_block(h, be[32 * blk : 32 * (blk + 1)])
    # digest byte stream: BE 64-bit words -> LE stream words
    out = []
    for j in range(8):
        out.append(_bswap32(h[j, 1]))
        out.append(_bswap32(h[j, 0]))
    return jnp.stack(out)
