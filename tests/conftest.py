"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(`jax.sharding.Mesh` + `shard_map`) is exercised without TPU hardware, per the
driver's dry-run model.  Must set env vars before jax initializes.
"""

import os
import sys

# NOTE: the machine profile exports JAX_PLATFORMS=axon (the TPU plugin), so a
# plain env override is not reliable — force the platform through the config
# API before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test files.

    The full suite compiles thousands of CPU executables; past ~150 tests
    the accumulated XLA:CPU JIT state segfaults inside
    ``backend_compile_and_load`` (jax 0.9.0; reproduced twice at different
    tests, position drifts with suite size, any prefix subset passes).
    Dropping the pjit caches per module keeps live JIT memory bounded; the
    cost is one recompile of the shared kernels per file."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_dataset():
    """Clustered 2000x48 float32 dataset + 100 queries."""
    from scalablevectorsearch_tpu.core.io import generate_test_dataset
    return generate_test_dataset(2000, 100, 48, seed=7)


@pytest.fixture(scope="session")
def bundled_dataset():
    """Deterministic 10k x 128 dataset + 500 queries — this framework's analog
    of the reference's bundled test dataset (whose base vectors are not
    shipped in this snapshot; only its query/groundtruth files exist)."""
    from scalablevectorsearch_tpu.core.io import generate_test_dataset
    return generate_test_dataset(10_000, 500, 128, seed=1234)
