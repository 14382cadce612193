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
# persistent XLA compilation cache: the suite compiles the same tiny-model
# programs dozens of times across test files AND subprocess CLI runs (anchor
# sweep, multihost); sharing compiled executables across runs cuts the
# dominant cost of the suite. Inherited by subprocesses via the env var.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax  # noqa: E402

if not _USE_TPU:
    # The axon sitecustomize force-registers the remote-TPU backend and
    # overrides JAX_PLATFORMS; pin the config so tests run on local CPU.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# activate the persistent cache for the test process itself (subprocesses
# pick it up through the env var via lmsfc_tpu._enable_compilation_cache)
import lmsfc_tpu  # noqa: E402,F401


def pytest_configure(config):
    # the DEFAULT run is the fast tier (`-m "not slow"` via pyproject
    # addopts, VERDICT r4 next #8); `pytest -m ""` runs everything.
    # Skips in this suite are strictly environmental (TPU flag, D2 weights,
    # vendored CompressAI fixtures, torch/pallas availability) — see
    # tests/test_suite_hygiene.py which enforces that.
    config.addinivalue_line("markers", "slow: long-running e2e test")
