"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the analog of the
reference's DummyComm unit-testing strategy, but actually exercising
collectives — see SURVEY.md §4 'Distributed testing without a cluster').
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, overriding JAX_PLATFORMS. Re-override it
# before any backend initializes so tests run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


pytest_plugins = ("aiohttp.pytest_plugin",)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU's JIT segfaults inside backend_compile_and_load after a few
    hundred compilations accumulate in one process (reproducible at ~110
    test files in, at varying tests — LLVM JIT state, not any one test).
    Dropping the executable caches between modules keeps the full suite in
    one `pytest tests/` invocation stable."""
    yield
    jax.clear_caches()
