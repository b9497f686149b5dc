"""Native (C) host components, loaded via ctypes with lazy compilation.

The TPU owns all bulk math; what remains on the host is sequential
protocol logic — Fiat–Shamir transcripts, grinding searches, Merkle path
checks — which the reference implements on native Rust/`sha3`
(``crypto/src/fiat_shamir/default_transcript.rs:9``,
``provers/stark/src/grinding.rs``).  This package provides the same
native substrate: a C Keccak-256 (+ nonce grinder) compiled on first use
with the system compiler.  Every caller falls back to the pure-Python
implementation when no compiler is available, so the native layer is an
accelerator, never a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libkeccak.so")
_SRC = os.path.join(_DIR, "keccak.c")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def load():
    """The ctypes library handle, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.lw_keccak256.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib.lw_keccak256.restype = None
        lib.lw_grind.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.lw_grind.restype = ctypes.c_int64
        if hasattr(lib, "lw_merkle_levels"):
            lib.lw_merkle_levels.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.lw_merkle_levels.restype = None
        _lib = lib
        return _lib


def keccak256(data: bytes):
    """Native keccak-256, or None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.lw_keccak256(bytes(data), len(data), out)
    return out.raw


def grind(inner32: bytes, factor: int, start: int, count: int):
    """Native nonce search; returns the nonce, -1 if not in range, or
    None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    return int(lib.lw_grind(bytes(inner32), int(factor), start, count))


def merkle_levels(leaf_digests: list):
    """All keccak-256 Merkle levels above ``leaf_digests`` (a power-of-two
    list of 32-byte digests), leaf level first, root level last — or None
    when the native library is unavailable.

    One ctypes call builds every parent in C (the sequential level walk
    costs ~1 us/hash; the reference parallelises the same loop with rayon,
    ``crypto/src/merkle_tree/merkle.rs:33``)."""
    lib = load()
    if lib is None or not hasattr(lib, "lw_merkle_levels"):
        return None
    n = len(leaf_digests)
    if n & (n - 1) or n == 0:
        raise ValueError("leaf count must be a power of two")
    buf = ctypes.create_string_buffer(32 * 2 * n)
    ctypes.memmove(ctypes.byref(buf, 32 * n), b"".join(leaf_digests), 32 * n)
    if n > 1:
        lib.lw_merkle_levels(buf, n)
    raw = buf.raw
    levels = []
    size = n
    while size >= 1:
        base = 32 * size
        levels.append([raw[base + 32 * j: base + 32 * j + 32]
                       for j in range(size)])
        if size == 1:
            break
        size >>= 1
    return levels
