"""Test config: run on CPU with an 8-device virtual mesh (the standard JAX
trick for testing pjit/shard_map topologies without TPU hardware —
SURVEY.md §4).  Must run before any jax computation.

Note: this environment pins JAX_PLATFORMS via the TPU plugin, so the env
var alone is not enough — jax.config.update is authoritative.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
