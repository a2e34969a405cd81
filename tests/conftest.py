"""Test configuration: force an 8-device virtual CPU mesh so every
sharding/collective path is exercised without TPU hardware.

This environment may pre-register a TPU PJRT plugin from sitecustomize
that pins `jax_platforms` via jax.config at interpreter start (which
overrides the JAX_PLATFORMS env var). Re-pinning through jax.config
before the first backend use wins, so tests always get the virtual
CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
