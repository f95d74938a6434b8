"""Test configuration.

Tests run on CPU with a virtual 8-device platform so multi-chip sharding is
exercised without TPU hardware (the driver dry-runs the real multi-chip path
separately).  The environment's sitecustomize force-registers the TPU plugin
and prepends it to ``jax_platforms``, so the env var alone is not enough —
the config must be updated before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: shape-bucketed dispatch variants compile once
# across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/psearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
