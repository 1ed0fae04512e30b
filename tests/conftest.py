"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip behavior (sharded eval, pjit train step) is validated without TPU
hardware by asking XLA for 8 host-platform devices, the strategy SURVEY.md S4
prescribes for the rebuild. Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize registers the TPU plugin at interpreter startup and
# pins jax_platforms='axon' in jax.config, which wins over the env var; undo
# it before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
