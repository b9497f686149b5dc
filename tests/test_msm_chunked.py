"""Chunked bucket accumulation (MSM inner pipeline) vs brute force.

``bucket_accumulate_chunked`` is generic over the group-law surface, so it
is fuzzed here with plain integer sums — hundreds of random shapes in
seconds, no EC compiles.  The EC path is covered by the Pippenger
cross-checks in test_curves.py (the large-batch default engages chunking).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lambda_elliptic_curves_tpu.curves.msm import bucket_accumulate_chunked


class IntSumOps:
    """Integer-sum 'group': 1-component tuples of (1, W, B) uint32."""

    def neutral(self, shape):
        return (jnp.zeros((1,) + shape, jnp.uint32),)

    def add(self, a, b):
        return (a[0] + b[0],)

    def select(self, cond, a, b):
        return (jnp.where(cond[None], a[0], b[0]),)

    def shift_down(self, pt, shift, fill=None):
        n = pt[0].shape[-1]
        fill = fill or self.neutral(pt[0].shape[1:])
        out = []
        for comp, fc in zip(pt, fill):
            ext = jnp.concatenate([fc, comp], axis=-1)
            out.append(
                jax.lax.dynamic_slice_in_dim(ext, n - shift, n, axis=-1))
        return tuple(out)

    def segmented_scan(self, pt, seg_start):
        n = pt[0].shape[-1]
        levels = max((n - 1).bit_length(), 1)
        ones = jnp.ones_like(seg_start)

        def body(carry, t):
            ptc, flags = carry
            shift = jnp.left_shift(jnp.int32(1), t)
            prev = self.shift_down(ptc, shift)
            prev_flags = jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([ones, flags], axis=-1), n - shift, n,
                axis=-1)
            combined = self.add(ptc, prev)
            new_pt = self.select(flags == 1, ptc, combined)
            return (new_pt, flags | prev_flags), None

        (out, _), _ = jax.lax.scan(
            body, (pt, seg_start), jnp.arange(levels, dtype=jnp.int32))
        return out


@pytest.mark.parametrize("seed", [0, 1])
def test_chunked_bucket_accumulation_fuzz(seed):
    ops = IntSumOps()
    rng = np.random.default_rng(seed)
    for _ in range(120):
        W = int(rng.integers(1, 3))
        L = int(rng.choice([2, 4, 8]))
        C = int(rng.choice([2, 4, 8]))
        B = L * C
        nb = int(rng.integers(3, 9))
        ids = np.sort(rng.integers(0, nb, (W, B)).astype(np.uint32), axis=-1)
        vals = rng.integers(1, 100, (1, W, B)).astype(np.uint32)
        got = bucket_accumulate_chunked(
            ops, jnp.asarray(ids), (jnp.asarray(vals),), nb, L)
        got = np.asarray(got[0])[0][..., :nb]
        want = np.zeros((W, nb), np.uint32)
        for w in range(W):
            for i in range(B):
                want[w, ids[w, i]] += vals[0, w, i]
        assert (got == want).all()


def test_chunked_degenerate_shapes():
    ops = IntSumOps()
    # single column, single bucket, all-equal ids
    ids = jnp.asarray(np.zeros((1, 8), np.uint32))
    vals = jnp.asarray(np.arange(1, 9, dtype=np.uint32).reshape(1, 1, 8))
    got = bucket_accumulate_chunked(ops, ids, (vals,), 4, 8)
    assert int(np.asarray(got[0])[0, 0, 0]) == 36
    # every element its own bucket
    ids = jnp.asarray(np.arange(8, dtype=np.uint32).reshape(1, 8))
    got = bucket_accumulate_chunked(ops, ids, (vals,), 8, 4)
    assert list(np.asarray(got[0])[0, 0, :8]) == list(range(1, 9))
