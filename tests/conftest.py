"""Test harness configuration: virtual 8-device CPU mesh.

Tests exercise the multi-chip sharding paths on a virtual CPU mesh
(xla_force_host_platform_device_count), the TPU-world analog of the
reference's parallel-vs-iterative sampler determinism tests
(reference tests/test_samplers.py:116-150).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Must be a config update, not JAX_PLATFORMS: the host environment may pin
# another platform via sitecustomize (e.g. a TPU tunnel).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
