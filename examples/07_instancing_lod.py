"""Example 07: true instancing at the reference's batch limit + LOD chains.

Renders a 65,536-instance cube batch — MAX_INSTANCES_PER_BATCH
(reference instancing.rs:16) — through the InstancingManager. The packed
scene stores the cube's vertex attributes ONCE (shared vertex pool,
render/scene.py); instances contribute int32 expansion maps only.

Then a LOD scene: spheres with 3-level chains (Mesh.add_lod) rendered from
near and far, printing LodStats.reduction_rate (screen-coverage selection
runs in-jit; reference lod_system.rs:300-346).

Run: python examples/07_instancing_lod.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
from ash_tpu.render.instancing import (
    MAX_INSTANCES_PER_BATCH,
    InstanceData,
    InstancingManager,
)


def instancing_demo():
    n = MAX_INSTANCES_PER_BATCH  # 65,536
    side = 40  # 40^3 = 64,000; remainder stacks above
    surface = HeadlessSurface(1920, 1080)
    # Small tiles for sub-tile-sized instances; prev-frame Hi-Z occlusion
    # culls the solid block's interior cubes draw-by-draw.
    r = Renderer(surface, RendererConfig(tile_h=8, max_tris_per_tile=2048))
    r.set_occlusion_culling(True)
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(
        1, Material(color=(0.75, 0.3, 0.2, 1.0), roughness=0.4)
    )

    t0 = time.perf_counter()
    mgr = InstancingManager()
    base = np.eye(4, dtype=np.float32)
    base[:3, :3] *= 0.35
    for i in range(n):
        m = base.copy()
        z, rem = divmod(i, side * side)
        y, x = divmod(rem, side)
        m[:3, 3] = [(x - side / 2) * 1.2, (y - side / 2) * 1.2,
                    (z - side / 2) * 1.2]
        added = mgr.add_instance(0, 1, InstanceData(model=m))
        assert added  # must never be stripped: -O removing the CALL would
        # silently demo an empty batch, so the call lives outside the assert
    mgr.to_draw_items(r)
    st = mgr.stats()
    print(f"batched {st.total_instances} instances in {st.batch_count} batch "
          f"({time.perf_counter()-t0:.2f}s host)")

    t0 = time.perf_counter()
    ext = side * 1.2
    cam = Camera.new([ext, ext * 0.8, ext * 1.4], [0, 0, 0], 1920 / 1080)
    cam.far = ext * 6
    view, proj = cam.view_matrix(), cam.projection_matrix()
    out = r.render_frame(view, proj, cam.position)
    out.image.block_until_ready()
    # Second warmup: with occlusion culling on, frame 2 has a different jit
    # signature (prev_depth None -> array) and recompiles.
    r.render_frame(view, proj, cam.position).image.block_until_ready()
    print(f"pack + compile + first frames: {time.perf_counter()-t0:.1f}s")
    buf = r._scene.buffers
    print(f"unique vertex pool: {buf.num_unique_vertices} verts; expanded "
          f"{r._scene.num_vertices} verts / {r._scene.num_triangles} tris")

    frames = 10
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(view, proj, cam.position)
    out.image.block_until_ready()
    dt = (time.perf_counter() - t0) / frames
    print(f"65,536 instanced cubes @1080p: {dt*1000:.2f} ms/frame "
          f"({1/dt:.1f} fps), covered {int(out.covered_pixels)} px, "
          f"visible draws {int(out.visible_draws)} (Hi-Z occlusion), "
          f"overflow main={int(out.binning_overflow)} "
          f"shadow={int(out.shadow_overflow)}")


def lod_demo():
    ball = Mesh.create_sphere("ball", segments=48, rings=32)
    ball.add_lod(Mesh.create_sphere("l1", segments=20, rings=14), 0.02)
    ball.add_lod(Mesh.create_sphere("l2", segments=8, rings=6), 0.003)

    surface = HeadlessSurface(1920, 1080)
    r = Renderer(surface, RendererConfig(max_tris_per_tile=1024))
    r.register_mesh_handle(0, ball)
    r.register_material_handle(1, Material(color=(0.2, 0.5, 0.8, 1.0)))
    from ash_tpu.render import RenderCommand

    cmds = []
    for i in range(400):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [(i % 20 - 10) * 3.0, 0, (i // 20 - 10) * 3.0]
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)

    for dist, label in ((15.0, "near"), (30.0, "far")):
        cam = Camera.new([0, dist * 0.5, dist], [0, 0, 0], 1920 / 1080)
        cam.far = 600.0
        view, proj = cam.view_matrix(), cam.projection_matrix()
        out = r.render_frame(view, proj, cam.position)
        out.image.block_until_ready()
        stats = r.lod_stats(view, proj)
        print(f"LOD {label}: per-level {stats.objects_per_lod[:3]}, "
              f"culled {stats.objects_culled}, triangles "
              f"{stats.triangles_before} -> {stats.triangles_after} "
              f"(reduction {stats.reduction_rate:.1%})")


if __name__ == "__main__":
    instancing_demo()
    lod_demo()
