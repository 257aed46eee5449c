"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the JAX analogue of a fake backend;
SURVEY.md §4).

Note: a pytest plugin in this environment imports jax before conftest runs,
so env vars (JAX_PLATFORMS / XLA_FLAGS) are too late — we use
jax.config.update, which works any time before backend initialisation."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# no network in this environment: make hub lookups fail fast instead of
# retrying for minutes (remove_speakers' optional LaBSE path)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiles_between_modules():
    """One long pytest process accumulates hundreds of XLA:CPU
    executables; LLVM's JIT arena eventually fails (observed twice at
    this suite's size: 'LLVM compilation error: Cannot allocate memory'
    after ~75 compiles in tools_spec_acceptance, and a segfault inside
    backend_compile_and_load at ~95% of a 160-test run).  Dropping the
    jit caches between test modules keeps the process under the
    threshold; modules recompile their own tiny graphs, which is cheap
    relative to arena death."""
    yield
    jax.clear_caches()
