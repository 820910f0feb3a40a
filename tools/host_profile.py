"""Host-side profile of the ANIMATED frame loop (bench --animate config).

The animated bench is host-bound (VERDICT r3 weak #1): the device-side
dynamic frame is ~0.4 ms but the loop measures ~0.85 ms/frame. This tool
attributes the host budget per frame: animation math, update_transforms
(host matrix writes + the one device upload), camera math, and the
render_frame host path (uniform pack, config key, dispatch). Dispatch is
asynchronous on TPU, so per-call wall time here IS host cost; the device
residue shows up in the final block_until_ready.

Usage: python tools/host_profile.py [--frames 200] [--objects 1000]
       [--cprofile]  # additionally dump a cProfile top-40 of the loop
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the exact bench scene)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--objects", type=int, default=1000)
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    r, surface, cam, anim = bench.build_bench_renderer(1920, 1080, args.objects)
    view, proj = cam.view_matrix(), cam.projection_matrix()

    t0 = time.perf_counter()
    r.render_frame(view, proj, cam.position).image.block_until_ready()
    print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    r.wait_pipeline_optimization()
    # Warm the animated path (shadow re-render every frame).
    r.update_transforms(bench.animated_models(anim, 0.01))
    view = bench.orbit_camera(cam, anim["extent"], 0.01)
    r.render_frame(view, proj, cam.position).image.block_until_ready()

    n = args.frames
    buckets = {"anim_math": 0.0, "update_transforms": 0.0,
               "orbit_camera": 0.0, "render_frame": 0.0}
    ft = 0.0
    t_loop = time.perf_counter()
    for _ in range(n):
        ft += 1.0 / 60.0
        t = time.perf_counter()
        m = bench.animated_models(anim, ft)
        buckets["anim_math"] += time.perf_counter() - t
        t = time.perf_counter()
        r.update_transforms(m)
        buckets["update_transforms"] += time.perf_counter() - t
        t = time.perf_counter()
        view = bench.orbit_camera(cam, anim["extent"], ft)
        buckets["orbit_camera"] += time.perf_counter() - t
        t = time.perf_counter()
        out = r.render_frame(view, proj, cam.position)
        buckets["render_frame"] += time.perf_counter() - t
    t_host = time.perf_counter() - t_loop
    out.image.block_until_ready()
    t_total = time.perf_counter() - t_loop

    print(f"loop: {t_total/n*1000:.3f} ms/frame total "
          f"({n/t_total:.0f} fps), host-side sum {t_host/n*1000:.3f} ms")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v/n*1000:.3f} ms/frame")
    other = t_host - sum(buckets.values())
    print(f"  {'(loop overhead)':20s} {other/n*1000:.3f} ms/frame")
    print(f"  {'(device drain)':20s} {(t_total-t_host)/n*1000:.3f} ms/frame")

    if args.cprofile:
        import cProfile
        import pstats

        def loop():
            ftt = ft
            for _ in range(n):
                ftt += 1.0 / 60.0
                r.update_transforms(bench.animated_models(anim, ftt))
                v = bench.orbit_camera(cam, anim["extent"], ftt)
                r.render_frame(v, proj, cam.position)
            r._last_outputs.image.block_until_ready()

        prof = cProfile.Profile()
        prof.enable()
        loop()
        prof.disable()
        pstats.Stats(prof).sort_stats("cumulative").print_stats(40)


if __name__ == "__main__":
    main()
