"""Poseidon hash (Starknet/Cairo parameter set over Stark252).

Parity: the Hades permutation of ``crypto/src/hash/poseidon/mod.rs:26-58``
with the PoseidonCairoStark252 parameters
(``crypto/src/hash/poseidon/starknet/parameters.rs``): rate 2, capacity 1,
alpha 3, 8 full + 83 partial rounds, *optimized* flat round-constant table
(full rounds consume 3 constants, partial rounds 1, applied to state[2]),
and the specialised MDS mix
    t = s0+s1+s2;  s0' = t + 2*s0;  s1' = t - 2*s1;  s2' = t - 3*s2.
The 107 optimized constants ship as a JSON data table (public Starknet
protocol parameters).

TPU-native design: the permutation is *batched* — the device state is a
``(3, K, B)`` digit array and one call hashes B independent inputs (Merkle
leaf/parent layers, trace-row commitments).  The 83 partial rounds run as a
``lax.scan`` over the constant table so the compiled program stays small;
full rounds unroll (there are only 8).
"""

from __future__ import annotations

import functools
import json
import pathlib

import jax
import jax.numpy as jnp

from ..fields.zoo import Stark252
from ..fields.element import FieldElement

_CONSTANTS_PATH = pathlib.Path(__file__).parent / "poseidon_starknet_constants.json"

RATE = 2
CAPACITY = 1
N_FULL_ROUNDS = 8
N_PARTIAL_ROUNDS = 83


@functools.lru_cache(maxsize=None)
def round_constants() -> tuple:
    """The 107 optimized round constants as ints (flat table: 12 for the
    first 4 full rounds, 83 for partial rounds, 12 for the last 4)."""
    return tuple(int(h, 16) for h in json.loads(_CONSTANTS_PATH.read_text()))


# ---------------------------------------------------------------------------
# host (exact) path
# ---------------------------------------------------------------------------

def _mix_host(s):
    f = Stark252
    t = s[0] + s[1] + s[2]
    return [t + s[0] + s[0], t - s[1] - s[1], t - s[2] - s[2] - s[2]]


def hades_permutation_host(state):
    """Exact permutation over three host FieldElements."""
    f = Stark252
    s = [f(x) for x in state]
    rc = round_constants()
    idx = 0
    for _ in range(N_FULL_ROUNDS // 2):
        s = [v + f(rc[idx + i]) for i, v in enumerate(s)]
        s = [v * v * v for v in s]
        s = _mix_host(s)
        idx += 3
    for _ in range(N_PARTIAL_ROUNDS):
        s[2] = s[2] + f(rc[idx])
        s[2] = s[2] * s[2] * s[2]
        s = _mix_host(s)
        idx += 1
    for _ in range(N_FULL_ROUNDS // 2):
        s = [v + f(rc[idx + i]) for i, v in enumerate(s)]
        s = [v * v * v for v in s]
        s = _mix_host(s)
        idx += 3
    return s


def hash_host(x, y):
    """Two-to-one hash (``Poseidon::hash``): state [x, y, 2] -> s0."""
    return hades_permutation_host([x, y, 2])[0]


def hash_single_host(x):
    return hades_permutation_host([x, 0, 1])[0]


def hash_many_host(inputs):
    """Sponge over any number of inputs (``Poseidon::hash_many``)."""
    f = Stark252
    values = [f(v) for v in inputs] + [f(1)]
    while len(values) % RATE:
        values.append(f(0))
    state = [f(0), f(0), f(0)]
    for i in range(0, len(values), RATE):
        block = [state[j] + values[i + j] for j in range(RATE)] + state[RATE:]
        state = hades_permutation_host(block)
    return state[0]


# ---------------------------------------------------------------------------
# device (batched) path
# ---------------------------------------------------------------------------

def _cube(f, x):
    return f.mul(f.square(x), x)


def _mix(f, s):
    # s: (K, 3, *B) — digit axis stays first so field kernels see digits
    s0, s1, s2 = s[:, 0], s[:, 1], s[:, 2]
    t = f.add(f.add(s0, s1), s2)
    o0 = f.add(t, f.add(s0, s0))
    o1 = f.sub(t, f.add(s1, s1))
    o2 = f.sub(t, f.add(f.add(s2, s2), s2))
    return jnp.stack([o0, o1, o2], axis=1)


@functools.lru_cache(maxsize=1)
def _jitted_hades():
    return jax.jit(_hades_impl)


def hades_permutation(state):
    """Batched permutation: ``state`` is (K, 3, *B) Montgomery digits
    (jit-cached)."""
    return _jitted_hades()(state)


def _hades_impl(state):
    f = Stark252
    rc = round_constants()
    batch = state.shape[2:]

    def full_rounds(s, base):
        for r in range(N_FULL_ROUNDS // 2):
            consts = jnp.stack([
                f.constant(rc[base + 3 * r + i], batch) for i in range(3)
            ], axis=1)
            s = f.add(s, consts)
            s = _cube(f, s)
            s = _mix(f, s)
        return s

    state = full_rounds(state, 0)

    partial_consts = jnp.stack([
        f.constant(rc[12 + i], batch) for i in range(N_PARTIAL_ROUNDS)
    ])  # (83, K, *B)

    def partial_round(s, c):
        s2 = _cube(f, f.add(s[:, 2], c))
        s = jnp.concatenate([s[:, :2], s2[:, None]], axis=1)
        return _mix(f, s), None

    state, _ = jax.lax.scan(partial_round, state, partial_consts)
    return full_rounds(state, 12 + N_PARTIAL_ROUNDS)


def hash_pairs(left, right):
    """Batched two-to-one hash: (K, *B) x (K, *B) -> (K, *B)."""
    f = Stark252
    two = jnp.broadcast_to(f.constant(2, left.shape[1:]), left.shape)
    state = jnp.stack([left, right, two], axis=1)
    return hades_permutation(state)[:, 0]


def hash_single(x):
    """Batched single-input hash: state [x, 0, 1]."""
    f = Stark252
    zero = jnp.zeros_like(x)
    one = jnp.broadcast_to(f.constant(1, x.shape[1:]), x.shape)
    return hades_permutation(jnp.stack([x, zero, one], axis=1))[:, 0]
