"""Multi-chip NTT: four-step decomposition over a 1-D device mesh.

The reference has no distributed backend (rayon only; SURVEY.md §2.5) — this
is the TPU-native scaling axis: an N = N1*N2 transform becomes

1. N2 independent length-N1 NTTs (columns; batch-local),
2. twiddle multiply by w^(k1*j2) (local),
3. one ``all_to_all`` resharding (the only cross-chip exchange, riding ICI),
4. N1 independent length-N2 NTTs (rows; batch-local).

With the matrix sharded over j2 for step 1 and over k1 for step 4, each
chip only ever runs dense local batched NTTs, and the transpose is a single
collective.  Output is in "transposed" order: out[k2*N1 + k1] = C[k1, k2];
``ordering="natural"`` adds the final reshard to deliver coefficient order.

Index math: X[k2*N1 + k1] = sum_{j2} w_{N2}^{j2 k2} [ w_N^{j2 k1} *
sum_{j1} w_{N1}^{j1 k1} x[j1*N2 + j2] ].

Inputs may carry arbitrary batch dims between the digit axis and the
transform axis — ``(K, N)`` or ``(K, C, N)`` — so e.g. all trace columns of
a STARK round-1 ride ONE compiled program.  Compiled shard_map programs are
memoized per (field, size, root, mesh, axes, rank): repeated calls (other
columns, the inverse pass of a convolution, every dryrun/test invocation)
reuse the executable instead of re-jitting a fresh closure each time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.field import PrimeField
from ..poly import ntt


def _powers_from_device_base(field: PrimeField, base, count: int):
    """powers 1, b, b^2, ... b^(count-1) where ``base`` is a (K,) device
    scalar (Montgomery).  Doubling construction: log2(count) vector ops."""
    acc = base[:, None] * 0 + field.constant(1, (1,))
    step = base[:, None]
    built = 1
    while built < count:
        nxt = field.mul(acc, jnp.broadcast_to(step, acc.shape))
        acc = jnp.concatenate([acc, nxt], axis=-1)
        step = field.square(step)
        built *= 2
    return acc[..., :count]


def _pow_traced_exponent(field: PrimeField, base_int: int, exponent,
                         max_bits: int):
    """(w^exponent) for a traced uint32 exponent, via per-bit selects of
    precomputed w^(2^b) constants."""
    acc = field.constant(1, ())
    for b in range(max_bits):
        const = field.constant(pow(base_int, 1 << b, field.p), ())
        bit = (exponent >> b) & 1
        acc = field.select(bit == 1, field.mul(acc, const), acc)
    return acc


def _split(N: int, D: int):
    """Choose the N1*N2 factorisation for a D-way mesh (both divisible
    by D), or raise."""
    log_n = N.bit_length() - 1
    log_n1 = max(log_n // 2, D.bit_length() - 1)
    N1 = 1 << log_n1
    N2 = N // N1
    if N1 % D or N2 <= 0 or N2 % D:
        raise ValueError(f"N1={N1}, N2={N2} must be divisible by D={D}")
    return N1, N2


def splittable(N: int, D: int) -> bool:
    try:
        _split(N, D)
        return True
    except ValueError:
        return False


@functools.lru_cache(maxsize=None)
def _compiled_four_step(field, N1, N2, w, mesh, axes, rank):
    """One jitted shard_map program for the four-step NTT.

    ``axes`` is a 1-tuple (flat transpose) or a ``(dcn, ici)`` 2-tuple
    (factored transpose: ICI leg first, then DCN — each element moves over
    DCN exactly once, in large contiguous messages).  ``rank`` is the full
    input rank including the digit axis and the (N1, N2) matrix axes, so
    batch dims are ``rank - 3``.
    """
    if len(axes) == 1:
        (ax,) = axes

        def exchange(b):
            return jax.lax.all_to_all(
                b, ax, split_axis=rank - 2, concat_axis=rank - 1, tiled=True)

        def dev_index():
            return jax.lax.axis_index(ax)

        in_spec = P(*([None] * (rank - 1)), ax)
        out_spec = P(*([None] * (rank - 2)), ax, None)
    else:
        dcn, ici = axes
        C = mesh.shape[ici]

        def exchange(b):
            b = jax.lax.all_to_all(
                b, ici, split_axis=rank - 2, concat_axis=rank - 1, tiled=True)
            return jax.lax.all_to_all(
                b, dcn, split_axis=rank - 2, concat_axis=rank - 1, tiled=True)

        def dev_index():
            return jax.lax.axis_index(dcn) * C + jax.lax.axis_index(ici)

        in_spec = P(*([None] * (rank - 1)), axes)
        # after the factored exchange device (h, c) owns k1 block c*H + h:
        # the k1 axis comes out sharded ici-major
        out_spec = P(*([None] * (rank - 2)), (ici, dcn), None)

    local = functools.partial(_local_four_step, field, N1, N2, w,
                              dev_index, exchange)
    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_spec,
                                 out_specs=out_spec))


def _run_four_step(field, coeffs, mesh, axes, ordering, inverse):
    K, N = coeffs.shape[0], coeffs.shape[-1]
    batch = coeffs.shape[1:-1]
    D = 1
    for a in (axes if isinstance(axes, tuple) else (axes,)):
        D *= mesh.shape[a]
    N1, N2 = _split(N, D)

    w = field.params.primitive_root_of_unity(N.bit_length() - 1)
    if inverse:
        w = pow(w, field.p - 2, field.p)

    mat = coeffs.reshape((K,) + batch + (N1, N2))
    fn = _compiled_four_step(field, N1, N2, w, mesh, tuple(axes), mat.ndim)
    out = fn(mat)
    # out[..., k1, k2] sharded over k1; element (k1, k2) is X[k2*N1 + k1]
    if ordering == "natural":
        out = jnp.swapaxes(out, -1, -2).reshape((K,) + batch + (N,))
    if inverse:
        n_inv = field.constant(pow(N, field.p - 2, field.p), ())
        out = field.mul(out, jnp.broadcast_to(
            n_inv.reshape((K,) + (1,) * (out.ndim - 1)), out.shape))
    return out


def sharded_ntt(field: PrimeField, coeffs, mesh: Mesh, axis_name: str = "x",
                ordering: str = "transposed", inverse: bool = False):
    """Distributed NTT of ``coeffs`` (K, ..., N) over the mesh axis.

    Returns evaluations; ``ordering="transposed"`` leaves them in
    (k1-major) order — the cheap choice when chaining with pointwise ops
    and an inverse transform — while ``"natural"`` adds a final reshard.
    """
    return _run_four_step(field, coeffs, mesh, (axis_name,), ordering,
                          inverse)


def sharded_ntt_2d(field: PrimeField, coeffs, mesh: Mesh,
                   axis_names: tuple = ("dcn", "ici"),
                   ordering: str = "transposed", inverse: bool = False):
    """Multi-host NTT over a 2-D ``(dcn, ici)`` mesh with DCN-aware
    blocking (SURVEY §2.5 / §5 "multi-host" axis; the reference has no
    distributed backend to cite).

    The four-step's single transpose is factored into TWO tiled
    ``all_to_all`` exchanges: first over the fast intra-host ``ici`` axis
    (fine-grained interleaving), then over the slow cross-host ``dcn``
    axis — which therefore moves each element exactly once, in H-1 large
    contiguous messages per device, instead of riding D-1 small ones
    through the flat transpose.  Index bookkeeping: after the factored
    exchange, device (h, c) owns k1 block ``c*H + h``, i.e. the k1 axis
    comes out sharded **ici-major** — the out_specs declare exactly that,
    so downstream consumers see an ordinary sharded array.
    """
    return _run_four_step(field, coeffs, mesh, tuple(axis_names), ordering,
                          inverse)


def _local_four_step(field, N1, N2, w, dev_index, exchange, block):
    """Per-device body: block is (K, ..., N1, N2/D).  ``dev_index`` returns
    the device's flat position on the sharded j2 axis; ``exchange`` is the
    transpose collective (one flat all_to_all, or the factored ICI+DCN
    pair of :func:`sharded_ntt_2d`)."""
    K = block.shape[0]
    n_batch = block.ndim - 3
    n2_loc = block.shape[-1]
    # step 1: length-N1 NTTs along the N1 axis (batch = local j2 columns),
    # using the induced root w^N2 of order N1
    cols = jnp.swapaxes(block, -2, -1)  # (K, ..., n2_loc, N1)
    cols = _fft_with_root(field, cols, pow(w, N2, field.p))
    a = jnp.swapaxes(cols, -1, -2)  # (K, ..., N1, n2_loc), A[k1, j2]

    # step 2: twiddles w^(k1 * j2_global)
    me = dev_index()
    dev_off = me.astype(jnp.uint32) * jnp.uint32(n2_loc)
    base = _pow_traced_exponent(field, w, dev_off, (N1 * N2).bit_length())
    # w^(k1 * j2) = (w^(k1))^(j2); build local matrix by doubling over j2:
    # T[:, :, j] = (w^k1)^(dev_off + j) = (w^dev_off)^k1 * (w^k1)^j
    p_k1 = ntt.powers(field, w, N1)  # (K, N1): w^k1
    t = _powers_matrix(field, p_k1, n2_loc)  # (K, N1, n2_loc): (w^k1)^j
    # base_k1 = (w^k1)^dev_off = (w^dev_off)^k1
    base_k1 = _powers_from_device_base(field, base, N1)  # (K, N1)
    t = field.mul(t, base_k1[..., None])
    t = t.reshape((K,) + (1,) * n_batch + (N1, n2_loc))
    b = field.mul(a, jnp.broadcast_to(t, a.shape))

    # step 3: transpose — shard k1, gather full rows j2
    b = exchange(b)  # (K, ..., N1/D, N2)

    # step 4: length-N2 NTTs along the last axis
    c = _fft_with_root(field, b, pow(w, N1, field.p))
    return c  # (K, ..., N1/D, N2) = C[k1, k2]


def _powers_matrix(field, bases, count):
    """(K, M) bases -> (K, M, count) with [., m, j] = bases[m]^j, by
    doubling along j."""
    K, M = bases.shape
    acc = field.ones((M, 1))
    step = bases[..., None]
    built = 1
    while built < count:
        nxt = field.mul(acc, jnp.broadcast_to(step, acc.shape))
        acc = jnp.concatenate([acc, nxt], axis=-1)
        step = field.square(step)
        built *= 2
    return acc[..., :count]


def _fft_with_root(field, x, root_int):
    """Radix-2 NTT along the last axis using an explicit primitive root
    (needed because sub-transform roots are powers of the global root, not
    the field's canonical generator)."""
    return ntt.fft_with_root(x, field, root_int)
