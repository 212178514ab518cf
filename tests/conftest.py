"""Test configuration: force an 8-virtual-device CPU mesh.

Tests (including sharding/multi-chip tests) run on CPU so they are
hermetic and fast; the real-TPU path is exercised by bench.py and the
driver's compile checks.  XLA_FLAGS must be set before the CPU backend
initializes; jax_platforms must be forced via jax.config because the
environment's TPU plugin overrides the JAX_PLATFORMS env var.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles thousands of XLA CPU programs in one
    process; past ~60% of the suite the accumulated live executables
    deterministically SEGFAULT the XLA CPU client inside
    backend_compile_and_load (observed at
    test_spatial_fused.py::test_sharded_banded_tight_matches_generic,
    twice at the same site, with 124 GB of host RAM free — an XLA
    bookkeeping limit, not OOM).  Clearing per module caps the live
    count; cross-module cache reuse is negligible (different modules
    compile different programs)."""
    yield
    import jax

    jax.clear_caches()
