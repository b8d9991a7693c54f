"""Test config: run on 8 virtual CPU devices so data-parallel sharding,
collectives, and queue semantics are testable without a TPU pod
(SURVEY.md §4's recommended strategy)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin that force-selects
# itself via jax.config (overriding JAX_PLATFORMS from the env), so the
# override must happen in-process, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's wall-clock is dominated by
# repeated jit compiles of near-identical tiny-arch steps; cache them
# across tests AND across runs. (runner._enable_compile_cache respects an
# already-configured cache dir, so CLI-smoke tests share this one.)
_cache = os.path.join(
    os.path.expanduser("~"), ".cache", "hmmc_tpu_test_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
