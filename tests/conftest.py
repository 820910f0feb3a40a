"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# Force CPU: the ambient environment points JAX at a tunneled TPU ("axon"
# platform, registered by a sitecustomize that also overrides the jax_platforms
# config), which is slow for eager unit tests and single-chip only. Env var
# alone is not enough — set the config after import, before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
