"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

Note: this machine's sitecustomize imports jax at interpreter start (axon
TPU plugin), so the JAX_PLATFORMS env var is already latched — we must go
through jax.config instead.  XLA_FLAGS is still read lazily at backend
initialization, which hasn't happened yet when conftest runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
