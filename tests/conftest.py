"""Test harness: force an 8-virtual-device CPU platform.

All unit tests run on CPU with a virtual 8-device mesh so multi-chip sharding
code paths compile and execute without TPU hardware. The environment may have
already registered a TPU PJRT plugin and pinned ``JAX_PLATFORMS`` — we
override the platform through jax.config (which wins over the env var) before
any computation runs.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the jitted BA/frontend programs dominate test
# wall time; repeated suite runs reuse the compiled binaries.
from airslam_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    """Clear jax's executable caches when the process nears the kernel's
    vm.max_map_count limit (default 65530): every XLA:CPU executable holds
    JIT code mappings, and a full-suite process otherwise segfaults inside
    whichever compile/serialize/deserialize next calls mmap. See
    airslam_tpu.utils.jaxcache.bound_jit_code_maps."""
    yield
    jaxcache.bound_jit_code_maps()


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
