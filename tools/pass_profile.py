"""Per-pass device attribution of the production frame program.

Runs the standard bench scene, traces the fused executable with
`jax.profiler.trace`, and prints one attribution table per traced program
(frame program + cached shadow program) — real on-chip per-op time bucketed
by the `pass_*` named scopes in frame.py (VERDICT r2 item 4; the TPU form
of the reference's in-frame timestamp scopes, gpu_profiler.rs:229-275).

Usage (on the chip — run with the default env so the axon plugin loads):
    python tools/pass_profile.py                 # print tables
    python tools/pass_profile.py --fixture      # also refresh the
                                                 # tests/data capture
    python tools/pass_profile.py --small        # quick 480x270 scene

Note: collecting the profile downloads trace buffers from the plugin and
ends pipelined dispatch for this process (ROADMAP "tunnel dispatch
pathology") — run this standalone, never inside a timing loop.
"""

import argparse
import glob
import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", action="store_true",
                    help="refresh tests/data/frame_trace.xplane.pb.gz")
    ap.add_argument("--small", action="store_true",
                    help="480x270 scene (fast compile; fixture default)")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from bench import build_bench_renderer  # the standard bench scene
    from ash_tpu.render.diagnostics.pass_trace import profiles_from_xplane

    import jax

    small = args.small or args.fixture
    if small:
        width, height, n_obj = 480, 270, 27
    else:
        width, height, n_obj = 1920, 1080, 1000
    r, _surface, cam, _anim = build_bench_renderer(width, height, n_obj)
    view, proj = cam.view_matrix(), cam.projection_matrix()

    def run():
        r.render_frame(view, proj, cam.position).image.block_until_ready()

    for _ in range(3):
        run()
    # Tiered mode serves cold-effort split programs until the background
    # fused compile lands; trace the PROMOTED steady state, not whichever
    # tier happened to be live (and keep the one-time race out of the
    # traced region).
    if not r.wait_pipeline_optimization(timeout=600):
        print("WARNING: background fused compile still pending — the "
              "trace below measures the COLD split programs, not the "
              "promoted steady state", file=sys.stderr)
    run()
    log_dir = tempfile.mkdtemp(prefix="ash_pass_profile_")
    with jax.profiler.trace(log_dir):
        for _ in range(args.iters):
            run()
    pbs = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        raise SystemExit(f"no xplane.pb produced under {log_dir}")
    path = pbs[-1]
    for p in profiles_from_xplane(path):
        print(p.table())
        print()
    if args.fixture:
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "tests", "data", "frame_trace.xplane.pb.gz")
        with open(path, "rb") as f, gzip.open(dst, "wb", 9) as g:
            g.write(f.read())
        print(f"fixture refreshed: {os.path.normpath(dst)}")


if __name__ == "__main__":
    main()
