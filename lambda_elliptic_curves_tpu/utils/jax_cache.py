"""Persistent XLA compilation cache.

The digit-vector kernels trade tiny runtime graphs for trace-time
unrolling, so cold-start compiles dominate short runs (especially on the
1-core test hosts).  Enabling JAX's on-disk executable cache makes every
compile a once-per-machine cost.  Called from ``tests/conftest.py`` and
``bench.py``; safe to call multiple times.
"""

from __future__ import annotations

import hashlib
import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Default ON for accelerator backends, OFF for CPU (overridable with
    LWT_JAX_CACHE=1/0).  This jaxlib's *CPU* executable serialization
    writes entries stamped with compile-time pseudo-features
    (+prefer-no-scatter/-gather) that the loader's host-feature check
    rejects — usually a warning, but intermittently a hard abort inside
    ``get_executable_and_time`` — so the CPU backend keeps in-process
    caching only.  TPU (axon) executables reload cleanly and cold
    compiles through the 1-core host dominate bench wall time, so the
    on-disk cache is the default there.  The directory is keyed by an
    XLA-context hash so different flag/backend contexts never share
    entries."""
    import jax

    env = os.environ.get("LWT_JAX_CACHE")
    if env == "0":
        return
    if env != "1":
        try:
            platform = jax.default_backend()
        except Exception:
            return
        if platform == "cpu":
            return

    base = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    flags = " ".join(sorted(os.environ.get("XLA_FLAGS", "").split()))
    ctx = hashlib.md5(
        (flags
         + "|" + os.environ.get("JAX_PLATFORMS", "")
         + "|" + str(jax.config.jax_platforms)).encode()
    ).hexdigest()[:10]
    path = os.path.join(base, ctx)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass
