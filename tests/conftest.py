"""Test env: force CPU backend with 8 virtual devices so pjit/sharding tests
run single-host without TPUs (the standard JAX testing recipe).

Note: this machine's sitecustomize force-registers the axon TPU PJRT plugin,
which ignores the JAX_PLATFORMS env var — the config.update below is the
override that actually works, and it must run before any backend init.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavy suites (full-net dryruns, mesh train
# steps) compile identical programs every run; cached, repeat runs of the
# suite cut minutes of XLA:CPU compile time
os.makedirs("/tmp/ssp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ssp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def reference_dir():
    if not has_reference():
        pytest.skip("reference repo not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8
