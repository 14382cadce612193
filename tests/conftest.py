"""Test fixture environment: 8 virtual CPU devices for mesh/sharding tests.

Must set flags before jax is imported anywhere (hence top of conftest).
"""

import os

_USE_TPU = os.environ.get("LMSFC_TEST_TPU", "0") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    # The axon sitecustomize force-registers the remote-TPU backend and
    # overrides JAX_PLATFORMS; pin the config so tests run on local CPU.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    # `-m "not slow"` gives a fast dev loop; default runs everything
    config.addinivalue_line("markers", "slow: long-running e2e test")
