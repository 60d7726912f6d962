"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not in the test suite.

Note: this environment pre-imports jax from sitecustomize with
JAX_PLATFORMS pointing at the TPU tunnel, so plain env-var overrides are
too late — we must update jax.config at runtime (before any backend
initializes, which is still the case when conftest loads).
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
jax.config.update("jax_num_cpu_devices", 8)
