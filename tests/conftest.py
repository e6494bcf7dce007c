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
