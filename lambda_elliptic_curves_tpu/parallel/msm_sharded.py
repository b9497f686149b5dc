"""Multi-chip MSM: point-sharded Pippenger over a 1-D device mesh.

The reference scales MSM with rayon threads on one host
(``msm/pippenger.rs:109``); the TPU-native scaling axis shards the
(scalar, point) pairs across chips.  Each chip runs the full local
Pippenger pipeline on its shard (sort-by-bucket + segmented scans,
``curves/msm.py``) producing one partial *window value* per window; the
cross-chip reduction is then a single ``psum``-style group-law tree over
the mesh axis — O(log D) point additions riding ICI — followed by the
Horner double-and-add combine of windows, replicated on every chip.

Communication: one all-reduce of (windows, point-coords) tiny tensors;
all bulk work stays chip-local, which is why scaling efficiency tracks
the local Pippenger throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.msm import msm_pippenger, optimum_window_size, scalars_to_digits
from ..curves.weierstrass import JacobianOps, WeierstrassCurve


def _allreduce_point(ops: JacobianOps, pt, axis_name: str):
    """Group-law all-reduce over the mesh axis: all_gather the per-chip
    partials (B=1 points), then tree-reduce locally — identical result on
    every chip."""
    gathered = tuple(
        jax.lax.all_gather(c, axis_name, axis=-1, tiled=True) for c in pt
    )
    return ops.tree_reduce(gathered)


def sharded_msm(curve: WeierstrassCurve, scalars, points, mesh: Mesh,
                axis_name: str = "x", window_size: int | None = None):
    """Host scalars + host points -> host point, computed over the mesh.

    Pads the instance to a multiple of the mesh size with zero scalars
    (zero buckets are dropped by the local pipeline).
    """
    D = mesh.shape[axis_name]
    ops = JacobianOps(curve)
    n = len(scalars)
    pad = (-n) % D
    scalars = list(scalars) + [0] * pad
    points = list(points) + [curve.generator()] * pad
    c = window_size or optimum_window_size(max(n, 2))

    sc = scalars_to_digits(curve, scalars)        # (Ks, B)
    pts = ops.from_host(points)                   # 3 x (K, B)

    def local(sc_shard, px, py, pz):
        part = msm_pippenger(curve, sc_shard, (px, py, pz), c)  # B=1 point
        total = _allreduce_point(ops, part, axis_name)
        return total

    try:
        smap = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis_name),) * 4,
            out_specs=P(None, None),
            check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        smap = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis_name),) * 4,
            out_specs=P(None, None),
            check_rep=False,
        )
    fn = jax.jit(smap)
    out = fn(sc, *pts)
    return ops.to_host(out)[0]
