"""Test harness: force CPU backend with 8 virtual devices BEFORE jax import.

This is the multi-device simulation strategy SURVEY.md section 4 calls for:
sharding/collective paths are tested on a virtual CPU mesh so no pod (or even
a real TPU) is needed to run the suite.
"""
import os

# Force-override: the machine environment registers a real-TPU PJRT plugin at
# interpreter start (sitecustomize) and programmatically sets
# jax_platforms="axon,cpu", so env vars alone don't stick — tests must call
# jax.config.update AFTER import, BEFORE first backend use. Set
# PLOTPOINTE_TEST_TPU=1 to opt in to running the suite on the real device.
_USE_TPU = bool(os.environ.get("PLOTPOINTE_TEST_TPU"))
if not _USE_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small synthetic dataset shared across tests (module-scope for speed)."""
    from plotpointe_tpu.data.synthetic import synthetic_interactions

    return synthetic_interactions(n_users=300, n_items=200, n_interactions=4000, seed=7)


@pytest.fixture(scope="session")
def mesh8(devices8):
    from plotpointe_tpu.parallel.mesh import make_mesh

    return make_mesh({"data": 8}, devices=devices8)
