"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(``xla_force_host_platform_device_count``), mirroring how the driver
dry-runs the multichip path.  The axon sitecustomize pre-imports jax with
JAX_PLATFORMS=axon, so the platform must be overridden via jax.config (env
vars alone are too late) and XLA_FLAGS before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, jax.devices()
