"""Test configuration: force CPU with 8 virtual devices.

Per SURVEY.md §4.4 — ``xla_force_host_platform_device_count=8`` lets the
shard_map data-parallel tests run without a TPU slice; the same code runs
unmodified on real hardware.

Note: this environment pre-sets ``JAX_PLATFORMS=axon`` (TPU tunnel) and the
plugin overrides the env var, so the CPU pin must go through
``jax.config.update`` — XLA_FLAGS must still be set before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
