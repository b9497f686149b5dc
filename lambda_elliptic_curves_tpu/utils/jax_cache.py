"""Persistent XLA compilation cache.

The digit-vector kernels trade tiny runtime graphs for trace-time
unrolling, so cold-start compiles dominate short runs — and in the axon
environment compilation is offloaded to a remote service
(``PALLAS_AXON_REMOTE_COMPILE=1``) whose latency varies by minutes run to
run, for BOTH the TPU and the forced-CPU platforms.  Enabling JAX's
on-disk executable cache makes every compile a once-per-machine cost and
removes that variance.  Called from ``tests/conftest.py``, ``bench.py``
and ``__graft_entry__.dryrun_multichip``; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             force: bool = False) -> None:
    """Default ON for accelerator backends, opt-in for CPU
    (LWT_JAX_CACHE=1/0 overrides; ``force=True`` enables regardless —
    used by the driver dryrun, whose remote-offloaded CPU compiles cost
    minutes each when cold).

    Historical note: this jaxlib's *local* CPU executable serialization
    wrote entries stamped with compile-time pseudo-features
    (+prefer-no-scatter/-gather) that the loader's host-feature check
    sometimes rejected.  Under the axon remote-compile service the
    returned executables reload cleanly (verified: cross-process hits for
    shard_map/keccak/NTT programs on the forced-CPU platform), so forced
    callers get the cache on CPU too.

    One flat directory for all contexts: JAX's own cache key already
    hashes the XLA flags, compile options, and accelerator config
    (``jax._src.cache_key``), so a per-context subdirectory only
    fragments the cache across harnesses that set slightly different
    envs."""
    import jax

    env = os.environ.get("LWT_JAX_CACHE")
    if env == "0":
        return
    if env != "1" and not force:
        try:
            platform = jax.default_backend()
        except Exception:
            return
        if platform == "cpu":
            return

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass
