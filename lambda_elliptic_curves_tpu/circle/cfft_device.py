"""Batched device circle FFT over Mersenne31
(parity: ``math/src/circle/cfft.rs`` + ``polynomial.rs:18,42``, executed
as vectorised butterfly layers on single-u32 lanes — ``ops/m31.py``).

Layer structure matches the host reference exactly: layer i of the CFFT
butterflies chunks of 2^(i+1) with a per-position twiddle shared across
chunks, i.e. one reshape-broadcast-multiply pass per layer — the circle
analogue of the multiplicative NTT stages.  Orderings (cfft result
permutation, icfft input permutation, bit reversal) are static gathers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import m31
from .cosets import Coset
from .point import M31
from .twiddles import get_twiddles

U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _twiddle_arrays(log_n: int, config: str) -> tuple:
    coset = Coset.new_standard(log_n)
    layers = get_twiddles(coset, config)
    return tuple(jnp.asarray(np.array(layer, np.uint32)) for layer in layers)


@functools.lru_cache(maxsize=None)
def _bitrev_idx(n: int):
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return jnp.asarray(rev)


@functools.lru_cache(maxsize=None)
def _cfft_order_idx(n: int):
    """out[2i] = v[i], out[2i+1] = v[n-1-i]  (order_cfft_result)."""
    idx = np.zeros(n, np.int32)
    for i in range(n // 2):
        idx[2 * i] = i
        idx[2 * i + 1] = n - 1 - i
    return jnp.asarray(idx)


@functools.lru_cache(maxsize=None)
def _icfft_input_idx(n: int):
    """evens ascending then odds descending (order_icfft_input)."""
    idx = np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)[::-1]])
    return jnp.asarray(idx.astype(np.int32))


def cfft_dev(v, log_n: int):
    """CFFT layers over the last axis (values: (..., n) uint32 < p)."""
    tw = _twiddle_arrays(log_n, "evaluation")
    n = v.shape[-1]
    lead = v.shape[:-1]
    for i in range(log_n):
        half = 1 << i
        x = v.reshape(lead + (n // (2 * half), 2, half))
        hi = x[..., 0, :]
        lo = x[..., 1, :]
        t = tw[i].reshape((1,) * (x.ndim - 2) + (half,))
        temp = m31.mul(lo, t)
        v = jnp.stack([m31.add(hi, temp), m31.sub(hi, temp)], axis=-2)
        v = v.reshape(lead + (n,))
    return v


def icfft_dev(v, log_n: int):
    """Inverse CFFT layers (chunks shrink from n down)."""
    tw = _twiddle_arrays(log_n, "interpolation")
    n = v.shape[-1]
    lead = v.shape[:-1]
    for i in range(log_n):
        chunk = n >> i
        half = chunk >> 1
        x = v.reshape(lead + (n // chunk, 2, half))
        hi = x[..., 0, :]
        lo = x[..., 1, :]
        t = tw[i].reshape((1,) * (x.ndim - 2) + (half,))
        v = jnp.stack(
            [m31.add(hi, lo), m31.mul(m31.sub(hi, lo), t)], axis=-2
        )
        v = v.reshape(lead + (n,))
    return v


def evaluate_cfft_dev(coeffs):
    """(..., n) coefficient array -> evaluations on the standard coset in
    natural order (device counterpart of ``evaluate_cfft``)."""
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    permuted = jnp.take(coeffs, _bitrev_idx(n), axis=-1)
    out = cfft_dev(permuted, log_n)
    return jnp.take(out, _cfft_order_idx(n), axis=-1)


def interpolate_cfft_dev(evals):
    """Natural-order evaluations -> coefficients (device counterpart of
    ``interpolate_cfft``), including the 1/n scaling."""
    n = evals.shape[-1]
    log_n = n.bit_length() - 1
    ordered = jnp.take(evals, _icfft_input_idx(n), axis=-1)
    out = icfft_dev(ordered, log_n)
    out = jnp.take(out, _bitrev_idx(n), axis=-1)
    factor = U32(pow(n, -1, M31))
    return m31.mul(out, jnp.broadcast_to(factor, out.shape))
