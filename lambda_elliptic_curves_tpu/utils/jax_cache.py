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
    """Executables serialized under one XLA context (flags, backend set)
    can abort when deserialized under another ("target machine feature"
    mismatch), so the cache directory is keyed by a context hash — each
    context gets a self-consistent cache."""
    import jax

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
