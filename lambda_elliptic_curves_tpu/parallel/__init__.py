"""SPMD parallelism over device meshes: sharded NTT, sharded MSM."""

from .ntt_sharded import sharded_ntt  # noqa: F401
