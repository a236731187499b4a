"""Test configuration: simulate an 8-device TPU mesh on CPU.

Must set XLA flags before jax initializes (the standard way to test
pjit/shard_map collectives without TPU hardware).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax  # noqa: E402

# A site plugin may have pinned jax_platforms at interpreter startup
# (overriding the env var); force CPU for hermetic multi-device tests.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from ripor_tpu.core.mesh import MeshSpec, create_mesh
    return create_mesh(MeshSpec(data=4, model=2))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
