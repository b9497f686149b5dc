"""Batched device RPO (Rescue Prime Optimized) over Goldilocks.

Parity: the reference's permutation is built for bulk Merkle hashing
(``crypto/src/hash/rescue_prime/rescue_prime_optimized.rs:192``, used by
rayon-parallel leaf hashing through ``IsMerkleTreeBackend``).  Here one
call permutes B sponge states at once as Goldilocks digit arrays — the
TPU analogue of that data parallelism; the host class
(:class:`.rescue_prime.RescuePrimeOptimized`) stays the per-node oracle.

Design notes:
* state layout is ``(K, m, B)`` Montgomery digits (K = Goldilocks digit
  count, m = 12/16 sponge width, B = batch);
* the circulant MDS multiply is expressed as m broadcast muls + a tree
  of adds over the rotated state (m² lane-wide products — tiny next to
  the inverse S-box);
* x^(1/7) (the heavy half of each round) is a fixed-exponent square-and-
  multiply over the 64-bit ``ALPHA_INV`` — ~64 squarings + ~40 muls, all
  B-wide.  The whole 7-round permutation jits to one program per batch
  shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.zoo import Goldilocks
from . import rescue_prime as rp


@functools.lru_cache(maxsize=4)
def _mont_consts(security_level: int):
    """(rc, mds) as Montgomery digit arrays: rc (K, rounds*2m), mds (K, m)."""
    m, capacity, rc, mds = rp._params(security_level)
    mds_vec = [mds[0][j] for j in range(m)]  # circulant generator row 0
    return (Goldilocks.array(rc), Goldilocks.array(mds_vec), m, capacity)


def _mds_apply(f, state, mds_cols, m):
    """out_i = sum_j mds[(j - i) % m] * s_j  for the circulant matrix whose
    row i is the generator vector rotated right by i.

    ``state``: (K, m, B); ``mds_cols``: (K, m) generator vector.  Computed
    as m broadcast muls: for each j, s_j * mds_rotated so that output lane
    i accumulates mds[(j-i) % m] — i.e. add roll(mds, j)[i] * s_j."""
    K = state.shape[0]
    B = state.shape[2:]
    acc = None
    for j in range(m):
        # coefficient for output i is mds[(j - i) % m] = roll(reverse?) —
        # build the length-m column [mds[(j - i) % m] for i in 0..m)
        col = jnp.stack([mds_cols[:, (j - i) % m] for i in range(m)], axis=1)
        term = f.mul(col.reshape((K, m) + (1,) * len(B)),
                     state[:, j:j + 1])
        acc = term if acc is None else f.add(acc, term)
    return acc


def permutation_words(state, security_level: int = 128):
    """7 RPO rounds on ``state`` (K, m, *B) Montgomery digits."""
    f = Goldilocks
    rc, mds, m, _cap = _mont_consts(security_level)
    K = state.shape[0]
    bshape = (1,) * (state.ndim - 2)
    for rnd in range(rp.NUM_FULL_ROUNDS):
        state = _mds_apply(f, state, mds, m)
        c1 = rc[:, rnd * 2 * m: rnd * 2 * m + m].reshape((K, m) + bshape)
        state = f.add(state, c1)
        # x^7 = (x^2)^2 * x^2 * x
        x2 = f.square(state)
        x4 = f.square(x2)
        state = f.mul(f.mul(x4, x2), state)
        state = _mds_apply(f, state, mds, m)
        c2 = rc[:, rnd * 2 * m + m: rnd * 2 * m + 2 * m].reshape(
            (K, m) + bshape)
        state = f.add(state, c2)
        state = f.pow(state, rp.ALPHA_INV)
    return state


@functools.lru_cache(maxsize=8)
def _jit_hash_elements(ncols: int, security_level: int):
    """Batched fixed-width sponge: (K, ncols, B) elements -> (K, D, B)
    digests (D = rate/2 elements), one jitted program per width."""
    f = Goldilocks
    _rc, _mds, m, capacity = _mont_consts(security_level)
    rate = m - capacity

    def run(cols):
        K, nc, B = cols.shape[0], cols.shape[1], cols.shape[2:]
        state = jnp.zeros((K, m) + B, jnp.uint32)
        if nc % rate != 0:
            state = state.at[:, 0].set(
                jnp.broadcast_to(f.ones(()).reshape((K,) + (1,) * len(B)),
                                 (K,) + B))
        nblocks = nc // rate
        for blk in range(nblocks):
            chunk = cols[:, blk * rate:(blk + 1) * rate]
            state = state.at[:, capacity:capacity + rate].set(chunk)
            state = permutation_words(state, security_level)
        rem = nc % rate
        if rem:
            chunk = cols[:, nblocks * rate:]
            pad = jnp.zeros((K, rate - rem) + B, jnp.uint32)
            pad = pad.at[:, 0].set(
                jnp.broadcast_to(f.ones(()).reshape((K,) + (1,) * len(B)),
                                 (K,) + B))
            state = state.at[:, capacity:capacity + rate].set(
                jnp.concatenate([chunk, pad], axis=1))
            state = permutation_words(state, security_level)
        return state[:, capacity:capacity + rate // 2]

    return jax.jit(run)


def hash_elements_words(cols, security_level: int = 128):
    """(K, ncols, *B) Goldilocks Montgomery digits -> (K, D, *B) digest
    element digits (D = 4 at level 128, 5 at 160) — the batched analogue
    of ``RescuePrimeOptimized::hash`` (``rescue_prime_optimized.rs:205``)."""
    return _jit_hash_elements(int(cols.shape[1]), security_level)(cols)
