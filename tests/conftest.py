"""Test config: force an 8-device virtual CPU mesh before jax import.

Exercises all pjit/sharding paths without TPU hardware (SURVEY.md §4:
the reference has no test suite; this is the rebuild's harness).
"""

import os

# Force the virtual CPU mesh even when the environment pins a TPU backend.
# The axon sitecustomize imports jax at interpreter startup, so env-var edits
# here are too late — update the live jax config instead (backends are not
# initialized yet at conftest-import time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall clock on this class of
# single-core host is compile-dominated (round-3 verdict: 46 min); caching
# compiled executables across runs keeps the keep-green discipline cheap.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MRE_TEST_COMPILE_CACHE",
                                 os.path.expanduser("~/.cache/mre_tpu_test_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_kg():
    """A small random KG with enumerable brute-force semantics."""
    rng = np.random.default_rng(0)
    n_ent, n_rel, n_tri = 50, 7, 400
    tri = np.stack([
        rng.integers(0, n_ent, n_tri),
        rng.integers(0, n_rel, n_tri),
        rng.integers(0, n_ent, n_tri),
    ], axis=1).astype(np.int32)
    tri = np.unique(tri, axis=0)
    from mre_tpu.data.kg import TripleTable

    return TripleTable.build(tri, n_ent, n_rel)
