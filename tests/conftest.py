"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip logic is
exercised without TPU hardware; Pallas kernels run in interpreter mode there.
float64 is enabled for finite-difference oracles.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
