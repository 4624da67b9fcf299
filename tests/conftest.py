"""Test configuration: CPU backend with an 8-device virtual mesh + x64.

Mirrors SURVEY.md §4's TPU-build test plan: multi-device tests run on a
CPU-emulated pod slice (`--xla_force_host_platform_device_count=8`), and
float64 is enabled so the reference's Float64 tolerance tier
(`test/flow.jl`, rtol 1e-6) can be checked exactly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the TPU tunnel), so
# the env var above is latched too late — override through the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles dominate test wall-clock on
# small hosts; cache them across pytest processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(params=["float32", "float64"])
def dtype(request):
    import jax.numpy as jnp

    return {"float32": jnp.float32, "float64": jnp.float64}[request.param]


@pytest.fixture
def key():
    return jax.random.key(0)
