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

# pytest-xdist: the suite is parallel-safe BY FILE (run with
# `-n <workers> --dist loadfile`, see README "Running the tests") — the
# module-scoped _drop_live_programs fixture and the frame-program LRU
# assume one module's programs stay cached within one process. Under
# xdist each worker is its own process with its own vm.max_map_count
# budget; a tighter per-worker program cap keeps N workers' combined
# footprint (host RAM + mappings) bounded. Must be set before
# ash_tpu.render.frame first imports.
if os.environ.get("PYTEST_XDIST_WORKER"):
    os.environ.setdefault("ASH_MAX_LIVE_PROGRAMS", "24")
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


@pytest.fixture(autouse=True, scope="module")
def _drop_live_programs():
    """Release compiled frame programs between test modules.

    Every XLA:CPU executable holds its JIT code as anonymous mappings
    (~300 for a post-enabled program); Linux caps a process at
    vm.max_map_count (65530) mappings, and the full suite compiles
    enough distinct FrameConfig programs to exhaust it — XLA then
    SEGFAULTs (or deadlocks) mid-compile, observed deterministically
    around test #310. The frame-program registry is LRU-bounded now,
    but tests should ALSO not rely on cross-module cache state, so drop
    everything at each module boundary and let mappings unmap."""
    yield
    import gc

    from ash_tpu.render import frame as _frame

    # Background tiered compiles may still hold program references;
    # they finish on their own — clearing here only drops the registry.
    # (Deliberately NOT jax.clear_caches(): it freed <1% extra in
    # measurement and mutates global jit state that in-flight background
    # compile threads from the previous module may still be using.)
    _frame.clear_program_caches()
    gc.collect()
