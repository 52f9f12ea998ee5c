"""Test configuration: force CPU backend with 8 virtual devices.

The session environment preloads JAX with the axon TPU plugin (sitecustomize
on PYTHONPATH), so env vars alone are not enough — we must flip
jax.config before any backend is initialized. Multi-chip sharding tests use
the virtual 8-device CPU mesh (xla_force_host_platform_device_count),
mirroring how the driver dry-runs the multi-chip path.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("FASTTRACK_TEST_PLATFORM", "cpu"))
# Persistent compile cache: jaxlib 0.9.0's XLA:CPU LLVM JIT segfaults after
# a few hundred in-process compilations (see pyproject addopts note); a warm
# disk cache makes reruns compile almost nothing, and xdist workers share it.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
