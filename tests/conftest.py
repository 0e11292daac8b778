"""Test harness configuration.

The suite runs on a virtual 8-device CPU platform: correctness tests compile
in seconds there, and the `parallel/` sharding layer needs a multi-device
mesh (real multi-chip hardware is not available; single-chip TPU execution is
exercised by bench.py and __graft_entry__.py, whose remote compiles take
minutes each and would dominate the suite).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Pin the CPU platform. The environment's sitecustomize imports jax at
# interpreter startup (registering the axon TPU plugin), so env vars are
# already read; jax.config.update still works because no backend has been
# initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def fixture_paths():
    return {
        "settings": os.path.join(REFERENCE, "linemod_settings.yml"),
        "model_ply": os.path.join(REFERENCE, "models", "lagergehaeuse.ply"),
        "model_yml": os.path.join(REFERENCE, "models", "lagergehaeuse.yml"),
        "img0": os.path.join(REFERENCE, "benchmark", "img0.png"),
        "depth0": os.path.join(REFERENCE, "benchmark", "depth0.png"),
        "pose0": os.path.join(REFERENCE, "benchmark", "pose0.yml"),
    }


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
