"""Opt-in TPU-vs-CPU golden parity gate.

The CPU suite validates the Pallas rasterizer only in interpret mode; this
test runs the real Mosaic-compiled kernel on the chip and compares against
the committed CPU goldens (>= 40 dB). Skipped unless ASH_TPU_PARITY=1 —
conftest.py pins this process to the CPU backend, so the actual render runs
in a subprocess with a clean environment (tools/tpu_parity.py).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ASH_TPU_PARITY") != "1",
    reason="set ASH_TPU_PARITY=1 on a TPU host to run the on-chip parity gate",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tpu_golden_parity():
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS",)}
    # Strip the CPU-forcing flag conftest added; keep any user XLA_FLAGS.
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_parity.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    sys.stderr.write(proc.stdout + proc.stderr)
    assert proc.returncode == 0, f"TPU parity gate failed:\n{proc.stdout}\n{proc.stderr}"
