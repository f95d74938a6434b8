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
# NO persistent compile cache for tests: serializing/deserializing the
# sharded (8-virtual-device) CPU executable segfaults this jax build
# (r4: deterministic crashes in compilation_cache.put_executable_and_time
# and the matching get path, /tmp/pytest_r4{b,c}.log).  CPU compiles are
# cheap; reliability wins.
