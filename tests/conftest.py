"""Test configuration.

Tests run on CPU in float64 (the accuracy bar is 1e-4 vs an adaptive-quad
float64 oracle — SURVEY.md §4): a virtual 8-device CPU mesh exercises the
multi-chip sharding paths without TPU hardware, per the build-plan's test
strategy.  The float32 TPU path gets its own tolerance-budget tests.
"""

import os

# The image's sitecustomize registers the axon TPU backend and forces the
# platform to "axon" for every interpreter; jax.config.update below wins
# over both the env var and that registration.  (JAX_PLATFORMS alone is
# NOT enough here.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall-clock on this 1-core
# image is dominated by XLA CPU compiles of the big fused programs;
# caching them makes re-runs (the common dev loop) much faster.  Scoped
# to the test tree so driver/bench caches stay separate.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - older jax without the option
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fiducial():
    from chomp_tpu import default_cosmo

    return default_cosmo()


@pytest.fixture(scope="session")
def fiducial_model(fiducial):
    """Session-shared fiducial HaloModel — building it is the most
    expensive repeated setup across test files (eager CPU dispatch)."""
    from chomp_tpu import default_halo, halo
    from chomp_tpu.hod import default_hod

    return halo.build_halo_model(fiducial, default_halo(), default_hod())
