"""Test configuration: run all tests on the CPU backend with 8 virtual
devices, so multi-chip sharding tests work without TPU hardware and Pallas
kernels run in interpret mode."""

import os

# Force (not setdefault): the host environment pins JAX_PLATFORMS to the TPU
# tunnel; tests must run on CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if jax.default_backend() != "cpu":
    # The host sitecustomize initializes the TPU-tunnel backend at
    # interpreter startup, before this conftest runs; re-point JAX at CPU
    # and drop the already-initialized backends.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.clear_backends()
    except AttributeError:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
    assert jax.default_backend() == "cpu"

# Persistent compilation cache: this box has a single CPU core, so XLA
# compile time dominates test wall-clock. Cache compiled executables across
# runs (keyed by HLO, safe across code edits).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update(
    "jax_persistent_cache_enable_xla_caches", "xla_gpu_per_fusion_autotune_cache_dir"
)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
