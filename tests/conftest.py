"""Test configuration: force an 8-virtual-device CPU platform.

This is the JAX idiom for exercising sharding/collectives without a pod —
the driver separately dry-runs the multi-chip path the same way.

Note: the environment pre-imports jax and registers a tunneled TPU backend
(sitecustomize), so setting env vars here is too late for that part; we must
switch the platform through jax.config before any computation runs.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# compile locally: the axon sitecustomize offloads even CPU-platform
# compiles to the remote service, where they QUEUE BEHIND multi-minute
# TPU compiles (measured 2026-08-20: a 20 s test stalled ~50 min while a
# TPU bench compiled) and come back stamped with the service machine's
# CPU features, which this host's AOT loader then re-checks per load
# (~1 s/program).  Local XLA:CPU compiles are fast, queue-free, and
# cache cleanly for this machine.  LWT_TEST_REMOTE_COMPILE=1 restores
# the offload.
if os.environ.get("LWT_TEST_REMOTE_COMPILE") != "1":
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if "jax" in sys.modules:
    jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) >= 8, "tests expect 8 virtual CPU devices"

from lambda_elliptic_curves_tpu.utils.jax_cache import (  # noqa: E402
    enable_compilation_cache,
)

# force=True: the CPU-platform compiles are offloaded to the same remote
# service as TPU ones and their executables reload cleanly from the
# on-disk cache (cross-process hits verified); without it every test run
# pays every compile again (LWT_JAX_CACHE=0 still disables)
enable_compilation_cache(force=True)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Long single-process runs accumulate thousands of compiled
    executables; this jaxlib's CPU backend has intermittently segfaulted
    inside ``backend_compile_and_load`` deep into such runs.  Dropping the
    in-process executable caches at module boundaries bounds that state
    (at the cost of some cross-module recompiles)."""
    yield
    jax.clear_caches()
    gc.collect()
