"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding paths (mesh/shard_map) are exercised without TPU hardware.  This
must be set before JAX initializes, hence the module-level env mutation.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
