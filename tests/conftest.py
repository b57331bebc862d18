"""Test configuration: force an 8-virtual-device CPU platform.

Tests are hermetic and CPU-only (SURVEY.md §4's "multi-node without a real
cluster" analog): sharding tests run the same pjit/shard_map code on 8
virtual CPU devices via --xla_force_host_platform_device_count.  This must
happen before JAX initializes any backend.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
