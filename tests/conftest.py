"""Test config: force CPU with a virtual 8-device mesh for sharding tests."""

import os

# The outer environment may point JAX at the (single, exclusive) TPU tunnel;
# tests must run on host CPU with a virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
