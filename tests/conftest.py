"""Test config: host-CPU JAX with a virtual 8-device mesh.

Environment sanitization (stripping the remote-accelerator plugin and
forcing CPU) happens in ``jafpro_test_sanitize`` — an early ``-p`` plugin
wired through pytest.ini that re-execs before capture starts.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` is implicitly ``quick``: the full
    suite takes ~55 min on a 1-core driver-class host, so ``-m quick`` is
    the honest verify loop there (the slow tier holds the full-scale
    parity/e2e/CLI-training tests)."""
    import pytest

    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
