"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated
on XLA's host-platform virtual devices. Note: the hosted TPU platform plugin
overrides the JAX_PLATFORMS env var, so the platform is forced through
jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("GAUSPLAT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated; caching
# XLA executables across runs cuts it from ~24 min to a few minutes.
import pathlib

_cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of CPU executables in one process
    (~1.4 GB serialized); with all of them JIT-mapped at once, late large
    compiles/cache-loads crash inside XLA's executable loader (observed:
    SIGSEGV in backend_compile_and_load, SIGABRT in
    get_executable_and_time, both at the suite's biggest program while the
    same test passes in a fresh process). Dropping executable references
    per module keeps the mapped-code footprint bounded; the persistent
    disk cache makes the re-loads cheap.
    """
    yield
    jax.clear_caches()
