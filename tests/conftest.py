"""Test configuration.

Tests run on CPU with a virtual 8-device platform so multi-chip sharding is
exercised without TPU hardware (the driver dry-runs the real multi-chip path
separately).  Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
