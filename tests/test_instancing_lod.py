"""True instancing (shared vertex pool) + in-jit LOD selection."""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def _small_cfg(**kw):
    return RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=64,
        shadow_resolution=128, shadow_tile=32, shadow_tile_h=8,
        shadow_max_tris_per_tile=64, **kw,
    )


def test_instances_share_unique_vertex_pool():
    """N instances of one mesh store its attributes ONCE (instancing.rs:16's
    shared-vertex-buffer contract; round 1 duplicated per instance)."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(surface, _small_cfg())
    cube = Mesh.create_cube()
    r.register_mesh_handle(0, cube)
    r.register_material_handle(1, Material(color=(0.8, 0.2, 0.2, 1)))
    cmds = []
    n = 257
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [(i % 8) - 4, (i // 8 % 8) - 4, (i // 64) - 2]
        m[:3, :3] *= 0.3
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    cam = Camera.new([6, 5, 8], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    buf = r._scene.buffers
    # Unique pool holds ONE cube (24 verts, padded); expansion maps cover
    # all instances.
    assert buf.num_unique_vertices <= 32  # bucket of 24
    assert r._scene.num_vertices == 24 * n
    assert r._scene.num_triangles == 12 * n
    assert int(out.covered_pixels) > 100


def test_instancing_manager_batches_render():
    from ash_tpu.render.instancing import InstanceData, InstancingManager

    surface = HeadlessSurface(64, 64)
    r = Renderer(surface, _small_cfg(shadows_enabled=False))
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0.2, 0.8, 0.2, 1)))
    mgr = InstancingManager()
    for i in range(50):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [(i % 10) - 5, 0, (i // 10) - 2]
        m[:3, :3] *= 0.4
        assert mgr.add_instance(0, 1, InstanceData(model=m))
    mgr.to_draw_items(r)
    st = mgr.stats()
    assert st.total_instances == 50 and st.batch_count == 1
    cam = Camera.new([0, 8, 8], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    assert int(out.covered_pixels) > 200


def _lod_sphere():
    """Sphere with a 3-level LOD chain (create_sphere segment counts)."""
    m = Mesh.create_sphere("ball", segments=24, rings=16)
    m.add_lod(Mesh.create_sphere("ball_l1", segments=12, rings=8), 0.05)
    m.add_lod(Mesh.create_sphere("ball_l2", segments=6, rings=4), 0.01)
    return m


def _lod_scene(cam_dist):
    surface = HeadlessSurface(96, 96)
    r = Renderer(surface, _small_cfg(shadows_enabled=False))
    r.register_mesh_handle(0, _lod_sphere())
    r.register_material_handle(1, Material(color=(0.7, 0.7, 0.2, 1)))
    cmds = []
    for i in range(9):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [(i % 3 - 1) * 2.5, 0, (i // 3 - 1) * 2.5]
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    cam = Camera.new([0, cam_dist * 0.4, cam_dist], [0, 0, 0], 1.0)
    return r, surface, cam


def test_lod_levels_shift_with_distance():
    """Zooming out drops to coarser levels (lod_system.rs:300-346) and
    LodStats.reduction_rate reports the triangle savings."""
    near_r, _, near_cam = _lod_scene(4.0)
    near_out = near_r.render_frame(
        near_cam.view_matrix(), near_cam.projection_matrix(),
        near_cam.position,
    )
    near_stats = near_r.lod_stats(
        near_cam.view_matrix(), near_cam.projection_matrix()
    )

    far_r, far_surface, far_cam = _lod_scene(20.0)
    far_out = far_r.render_frame(
        far_cam.view_matrix(), far_cam.projection_matrix(), far_cam.position
    )
    far_stats = far_r.lod_stats(
        far_cam.view_matrix(), far_cam.projection_matrix()
    )

    # Near: the center sphere at least is full detail. Far: nothing is.
    assert near_stats.objects_per_lod[0] >= 1
    assert far_stats.objects_per_lod[0] == 0
    assert far_stats.reduction_rate > 0.5, far_stats
    assert near_stats.triangles_after > far_stats.triangles_after
    # Far scene still renders the coarse spheres.
    assert int(far_out.covered_pixels) > 0
    img = far_surface.read_back()
    assert img[..., :3].max() > 30


def test_lod_coverage_cull_drops_tiny_objects():
    r, _, cam = _lod_scene(60.0)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    stats = r.lod_stats(cam.view_matrix(), cam.projection_matrix())
    assert stats.objects_culled == 9
    assert stats.triangles_after == 0


def test_single_level_meshes_unaffected_by_lod_path():
    """Scenes without LOD chains keep lod_enabled off (no retrace cost)."""
    surface = HeadlessSurface(48, 48)
    r = Renderer(surface, _small_cfg(shadows_enabled=False))
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([3, 2, 4], [0, 0, 0], 1.0)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert r._frame_config(textured=False).lod_enabled is False
