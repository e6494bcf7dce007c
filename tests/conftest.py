"""Test configuration: run JAX on a virtual multi-device CPU mesh.

The image presets JAX_PLATFORMS=axon (single-TPU tunnel) and the axon hook
re-asserts it at import, so we must override via jax.config AFTER importing
jax, before any backend is initialized. XLA flags must be in the environment
before backend creation for the 8 virtual CPU devices used by sharding tests.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by
# XLA-CPU compiles of the mesh/kernel shapes (the 4 slowest tests alone
# were ~11 min); cached across runs they re-load in milliseconds.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass
