"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Multi-device tests run on faked CPU devices
(``--xla_force_host_platform_device_count=8``) — the JAX-native way to test
Mesh/pjit sharding without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a pytest plugin before this conftest runs,
# in which case the env var above came too late — but backends initialize
# lazily, so forcing the config here still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# The persistent compile cache is OFF by default for the suite: full-suite
# runs (215+ tests, torch + jax + native threads in one process) segfault
# nondeterministically INSIDE XLA:CPU executable (de)serialization
# (compilation_cache.get/put_executable_and_time — observed 3/3 full runs,
# never reproducible in any subset; see CLAUDE.md). Deterministic-but-cold
# beats fast-but-flaky for the green check. Set EDM_TESTS_JAX_CACHE=1 to
# re-enable when iterating on a few files (small runs never crashed).
if os.environ.get("EDM_TESTS_JAX_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
