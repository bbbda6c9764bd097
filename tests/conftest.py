"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip logic is
exercised without TPU hardware; Pallas kernels run in interpreter mode there.
float64 is enabled for finite-difference oracles.

Note: the axon TPU plugin force-prioritises itself over the JAX_PLATFORMS
env var, so the platform must be pinned via jax.config after import.
Set DEEPBLAST_TEST_TPU=1 to run the suite against the real TPU instead.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax  # noqa: E402

if not os.environ.get("DEEPBLAST_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
