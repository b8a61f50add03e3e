"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding paths (mesh/shard_map) are exercised without TPU hardware.  This
must be set before JAX initializes, hence the module-level env mutation.
"""

import os

# The machine environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must override it.  Set SUSHI_TEST_TPU=1 to deliberately run on the chip.
if os.environ.get("SUSHI_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon TPU plugin activates whenever either of these is set,
    # overriding JAX_PLATFORMS — drop both so tests really run on CPU
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("AXON_LOOPBACK_RELAY", None)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache: XLA compiles are slow on this 1-core box
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# a pytest plugin imports jax before this conftest runs, so jax has already
# bound its config defaults from the old environment — re-apply explicitly
if os.environ.get("SUSHI_TEST_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
