"""A/B RendererConfig variants on TRUE device time (in-graph scan slope).

Round 5 established that single-execution walls on the tunneled TPU
measure dispatch rate, not device time (ROADMAP "Tunnel measurement
model") — so every config experiment judged by those walls (bf16
shading "no speedup" at r3, packed gbuffer "a wash" at r4) must be
re-run against diagnostics/device_probe.ingraph_device_ms. This tool
builds the plain bench scene per variant and prints the honest ms.

Usage:
    python tools/device_ab.py                 # built-in variant sweep
    python tools/device_ab.py k=8,48         # custom scan K pair
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


VARIANTS = [
    ("baseline", {}),
    ("bf16_shade", {"shade_dtype": "bf16"}),
    ("gbuffer_packed", {"gbuffer_packed": True}),
    ("bf16+packed", {"shade_dtype": "bf16", "gbuffer_packed": True}),
]

# Raster tile-shape sweep (sweep=tiles): the r2 conclusion that 32x128 is
# optimal came from dispatch-rate walls — re-decide on device time.
# Round-5 result (1080p/1000obj): 64x128 = 0.65x baseline, 32x256 =
# 0.78x, smaller tiles much worse (8x128 = 3.7x) — bigger tiles win
# until VMEM/cap costs bite; sweep=tiles2 probes further up with
# area-scaled capacities (no overflow-rate change vs the 32x128 cap).
TILE_VARIANTS = [
    # Every row pins its shape explicitly so the table stays correct as
    # the RendererConfig default moves (it moved 32x128 -> 64x128 from
    # this sweep's own result).
    ("tile_64x128 (current default)", {"tile_h": 64, "tile_w": 128}),
    ("tile_32x128 (pre-r5 default)", {"tile_h": 32, "tile_w": 128}),
    ("tile_16x128", {"tile_h": 16, "tile_w": 128}),
    ("tile_8x128", {"tile_h": 8, "tile_w": 128}),
    ("tile_32x256", {"tile_h": 32, "tile_w": 256}),
    ("tile_16x256", {"tile_h": 16, "tile_w": 256}),
]

TILE_VARIANTS_2 = [
    ("tile_32x128_cap256 (pre-r5 default)",
     {"tile_h": 32, "tile_w": 128, "max_tris_per_tile": 256}),
    ("tile_64x128_cap512",
     {"tile_h": 64, "tile_w": 128, "max_tris_per_tile": 512}),
    ("tile_64x256_cap1024",
     {"tile_h": 64, "tile_w": 256, "max_tris_per_tile": 1024}),
    ("tile_128x128_cap1024",
     {"tile_h": 128, "tile_w": 128, "max_tris_per_tile": 1024}),
    ("tile_128x256_cap2048",
     {"tile_h": 128, "tile_w": 256, "max_tris_per_tile": 2048}),
    ("tile_64x512_cap2048",
     {"tile_h": 64, "tile_w": 512, "max_tris_per_tile": 2048}),
]


def main():
    k_lo, k_hi = 4, 24
    variants = VARIANTS
    for a in sys.argv[1:]:
        if a.startswith("k="):
            k_lo, k_hi = (int(v) for v in a[2:].split(","))
        elif a == "sweep=tiles":
            variants = TILE_VARIANTS
        elif a == "sweep=tiles2":
            variants = TILE_VARIANTS_2

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from ash_tpu.render.diagnostics.device_probe import ingraph_device_ms
    from ash_tpu.render.frame import clear_program_caches

    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = {}
    baseline_name = variants[0][0]
    for name, overrides in variants:
        t0 = time.perf_counter()
        r, surface, cam, _ = bench.build_bench_renderer(
            1920, 1080, 1000, **overrides
        )
        view, proj = cam.view_matrix(), cam.projection_matrix()
        out = r.render_frame(view, proj, cam.position)
        out.image.block_until_ready()
        r.render_frame(view, proj, cam.position).image.block_until_ready()
        res = ingraph_device_ms(r, k_lo=k_lo, k_hi=k_hi)
        build_s = time.perf_counter() - t0
        if res is None:
            print(f"{name}: probe unavailable", flush=True)
            continue
        results[name] = res["device_ms"]
        base = results.get(baseline_name)
        rel = f" ({res['device_ms'] / base:.3f}x baseline)" if base else ""
        print(
            f"{name}: device {res['device_ms']:.3f} ms/frame "
            f"({res['fps']:.1f} fps){rel} "
            f"[covered {res['covered']}, setup {build_s:.0f}s]",
            flush=True,
        )
        # Each variant compiles its own scan programs; drop them so four
        # variants don't pile up executables.
        del r, surface, out
        clear_program_caches()


if __name__ == "__main__":
    main()
