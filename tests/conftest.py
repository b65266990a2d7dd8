"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4c).

Note: this machine presets JAX_PLATFORMS=axon (TPU tunnel) and the plugin
wins over the env var, so we must use jax.config.update before any backend
initialization. XLA_FLAGS must also be set before the CPU client starts.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
