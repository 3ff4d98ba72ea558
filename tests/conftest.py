"""Test configuration: CPU backend with 8 virtual devices and float64.

Tests run on a virtual 8-device CPU mesh (SURVEY.md section 4) so
multi-chip sharding is exercised without TPU hardware; x64 is enabled so
golden comparisons against scipy oracles are meaningful.

Note: this environment's axon TPU plugin overrides JAX_PLATFORMS, so the
platform must be forced through jax.config before backend init.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU chip (runs in a subprocess; skipped "
        "when none is attached)")
