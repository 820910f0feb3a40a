"""Example 10: the 65k-instance contract at heavy-mesh scale.

Default mode: 10,000 instances of a 4,950-vertex / 9,604-triangle UV
sphere = ~96 million triangles and ~49.5 million expanded vertices — the
scale VERDICT r2 flagged as unproven for the shared-vertex-pool
instancing design (reference instancing.rs:16 promises 65,536 instances
per batch; a heavy mesh multiplies the per-triangle transients far past
what one fused frame program can hold in 16 GB HBM).

--cubes mode: the literal reference contract — 65,536 cube instances
(786k triangles) in one batch, rendered through ONE fused frame program
(no chunking needed).

The chunked-geometry path (RendererConfig.max_draws_per_chunk,
render/frame.py merge_band_outputs) bounds the transient: draws render
in groups through ONE compiled band program and depth-composite exactly.
Chunks with identical (mesh, material) sequences share ONE device
SceneBuffers (renderer._build_chunk_scenes), so a uniform fleet keeps a
single resident copy of the int32 expansion maps regardless of fleet
size. Measured HBM contract at 16 GB:

  - resident: one chunk's expansion maps (~130 MB at 3M tris/chunk) +
    per-instance model matrices (64 B each) + frame targets — instance
    count is NOT the binding constraint (10M instances ≈ 640 MB of
    matrices); per-chunk triangle count is.
  - transient: ~124 B/tri of raster setup per in-flight chunk; pick
    max_draws_per_chunk ~= 3e6 / tris_per_mesh to stay under ~400 MB,
    and the renderer fences one frame deep so queued frames cannot
    stack transients (renderer._render_frame_chunked).

Run: python examples/10_mega_instancing.py [n_instances] [--cubes]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

# Persistent compilation cache: the ~100 s cold compile of the two band
# programs (full chunk + remainder) runs once per machine.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__) or ".", "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    cubes = "--cubes" in sys.argv
    if cubes:
        # The literal reference contract: 65,536 instances in one batch
        # (instancing.rs:16). A cube fleet is 786k triangles — no chunking
        # needed; the whole fleet renders through ONE fused frame program.
        n = int(args[0]) if args else 65_536
        mesh = Mesh.create_cube()
    else:
        n = int(args[0]) if args else 10_000
        mesh = Mesh.create_sphere("heavy", segments=98, rings=49)
    verts = len(mesh.vertices.position)
    tris = len(mesh.indices) // 3
    # ~3M triangles per chunk: ~124 B/tri of setup transient ≈ 380 MB.
    per_chunk = None if cubes else max(1, int(3e6 / tris))
    chunk_note = (
        "single fused program (no chunking)" if per_chunk is None
        else f"{per_chunk} draws/chunk -> "
        f"{(n + per_chunk - 1) // per_chunk} chunks"
    )
    print(f"{n} instances x {verts} verts / {tris} tris "
          f"= {n * tris / 1e6:.0f}M triangles, "
          f"{n * verts / 1e6:.1f}M expanded verts; {chunk_note}")

    surface = HeadlessSurface(1920, 1080)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8,
            max_tris_per_tile=2048,
            shadows_enabled=False,  # opaque chunked contract (see config)
            max_draws_per_chunk=per_chunk,
            # Sub-pixel spheres stack past any practical per-tile cap at
            # this density; nearest-policy overflow drops the FARTHEST
            # triangles so the cap bounds memory without visible holes
            # (same rationale as example 08).
            binning_policy="nearest",
        ),
    )
    r.register_mesh_handle(0, mesh)
    r.register_material_handle(
        1, Material(color=(0.3, 0.55, 0.8, 1.0), roughness=0.5)
    )

    t0 = time.perf_counter()
    side = int(round(n ** (1 / 3)))
    while side**3 < n:
        side += 1
    cmds = []
    base = np.eye(4, dtype=np.float32)
    base[:3, :3] *= 0.45
    for i in range(n):
        m = base.copy()
        z, rem = divmod(i, side * side)
        y, x = divmod(rem, side)
        m[:3, 3] = [(x - side / 2) * 1.3, (y - side / 2) * 1.3,
                    (z - side / 2) * 1.3]
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    print(f"scene pack: {time.perf_counter()-t0:.1f}s host")

    ext = side * 1.3
    cam = Camera.new([ext, ext * 0.8, ext * 1.4], [0, 0, 0], 1920 / 1080)
    cam.far = ext * 6
    view, proj = cam.view_matrix(), cam.projection_matrix()

    t0 = time.perf_counter()
    out = r.render_frame(view, proj, cam.position)
    out.image.block_until_ready()
    print(f"compile + first frame: {time.perf_counter()-t0:.1f}s")

    frames = 3
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(view, proj, cam.position)
    out.image.block_until_ready()
    dt = (time.perf_counter() - t0) / frames

    import jax

    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
    # Readbacks AFTER all timing (tunnel rule).
    print(f"{n} x {tris}-tri instances @1080p: {dt*1000:.1f} ms/frame "
          f"({1/dt:.2f} fps), covered {int(out.covered_pixels)} px, "
          f"overflow {int(out.binning_overflow)}, "
          f"device peak {peak:.2f} GiB")


if __name__ == "__main__":
    main()
