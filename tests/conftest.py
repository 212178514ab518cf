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
