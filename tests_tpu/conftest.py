"""TPU smoke tier — runs ONLY on real TPU silicon.

The main suite (``tests/``) forces an 8-virtual-CPU platform, which is
right for logic/sharding coverage but means nothing exercises the
TPU-only dispatch seams (Pallas probes, Mosaic lowering, kernel-vs-XLA
routing) before the round's single bench run.  Round 4 shipped a bug in
exactly that seam: the Pallas keccak probe ran under an ambient jit
trace, threw, and permanently cached "unavailable" — undetectable on the
CPU rig, where ``available()`` short-circuits before the probe.

This tier is the guard: ~2 minutes on the chip, run it before any bench
(``python -m pytest tests_tpu/ -q``).  Off-TPU every test here skips.
"""

import gc
import os

# keep whatever platform the environment provides — no CPU forcing
flags = os.environ.get("XLA_FLAGS", "")

import jax  # noqa: E402

import pytest  # noqa: E402

ON_TPU = jax.default_backend() == "tpu"

from lambda_elliptic_curves_tpu.utils.jax_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    if ON_TPU:
        return
    skip = pytest.mark.skip(reason="TPU smoke tier: no TPU backend present")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _gc_between_modules():
    yield
    gc.collect()
