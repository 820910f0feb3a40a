"""TPU-vs-CPU golden parity gate (VERDICT r1 item 8).

Renders the committed golden scenes with ``use_pallas=True`` on the default
JAX platform (the real TPU chip under the driver) and asserts PSNR >= 40 dB
against the CPU-rendered golden PNGs in tests/golden/. This validates the
Mosaic-compiled Pallas rasterizer on the hardware where it actually runs —
the CI suite only exercises it in interpret mode.

Run before benching:  python tools/tpu_parity.py
Exit code 0 = all scenes pass; prints one PSNR line per scene.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    import jax
    import numpy as np

    # Persistent cache so reruns are quick.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import golden_scenes
    from ash_tpu.utils.image import psnr, read_png

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({jax.devices()[0]})", file=sys.stderr)

    golden_scenes.CONFIG_OVERRIDES["use_pallas"] = True

    failures = []
    for name in sorted(golden_scenes.SCENES):
        path = os.path.join(golden_scenes.GOLDEN_DIR, f"{name}.png")
        if not os.path.exists(path):
            print(f"{name}: SKIP (no golden)", file=sys.stderr)
            continue
        golden = read_png(path)
        surface = golden_scenes.SCENES[name]()
        fresh = surface.read_back()
        value = float(psnr(fresh, golden))
        ok = value >= 40.0
        print(f"{name}: PSNR {value:.1f} dB {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append((name, value))

    if failures:
        print(f"TPU parity FAILED: {failures}", file=sys.stderr)
        return 1
    print("TPU parity OK (all scenes >= 40 dB, use_pallas=True)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
