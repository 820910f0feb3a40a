"""End-to-end headless renders: the 01/02 example configs from BASELINE.json."""

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def _camera(w, h, pos=(0, 2, 5)):
    cam = Camera.new(np.asarray(pos, np.float32), [0, 0, 0], w / h)
    return cam.view_matrix(), cam.projection_matrix(), cam.position


@pytest.fixture(scope="module")
def cube_render():
    """Render one 02_cube-style frame at 160x120 (module-scoped: jit once)."""
    surface = HeadlessSurface(160, 120)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=32,
            shadow_resolution=128, shadow_tile=32,
            shadow_max_tris_per_tile=32,
        ),
    )
    cube = Mesh.create_cube()
    r.set_mesh(cube)
    r.set_material(Material(color=(0.8, 0.2, 0.2, 1.0), metallic=0.5, roughness=0.5))
    view, proj, pos = _camera(160, 120)
    out = r.render_frame(view, proj, pos)
    return r, surface, out


def test_cube_renders_red_ish_center(cube_render):
    _, surface, _ = cube_render
    img = surface.read_back()
    assert img.shape == (120, 160, 4) and img.dtype == np.uint8
    center = img[60, 80]
    # Red cube under white-ish light: red channel dominates.
    assert center[0] > center[2] and center[0] > 40, center
    assert center[3] == 255
    # Background is the black clear color.
    assert tuple(img[2, 2][:3]) == (0, 0, 0)


def test_cube_coverage_and_depth(cube_render):
    r, _, out = cube_render
    depth = np.asarray(out.depth)
    covered = int(out.covered_pixels)
    assert 0.05 * 120 * 160 < covered < 0.95 * 120 * 160
    assert depth.min() > 0.0 and depth.max() == 1.0
    assert int(out.binning_overflow) == 0


def test_shadow_map_rendered(cube_render):
    _, _, out = cube_render
    sm = np.asarray(out.shadow_map)
    assert sm.shape == (128, 128)
    # The cube occupies some of the light's view.
    assert (sm < 1.0).mean() > 0.001
    assert sm.min() >= 0.0


def test_second_frame_reuses_jit_and_rotates(cube_render):
    r, surface, _ = cube_render
    view, proj, pos = _camera(160, 120)
    r.transform.rotate([0.0, 0.7, 0.0])
    out2 = r.render_frame(view, proj, pos)
    img2 = surface.read_back()
    assert r.frame_count == 2
    assert img2.shape == (120, 160, 4)


def test_material_mut_changes_output():
    surface = HeadlessSurface(96, 96)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=32,
            shadows_enabled=False,
        ),
    )
    r.set_mesh(Mesh.create_cube())
    view, proj, pos = _camera(96, 96)
    r.material_mut().color = (1.0, 0.0, 0.0, 1.0)
    a = np.asarray(r.render_frame(view, proj, pos).color)
    r.material_mut().color = (0.0, 0.0, 1.0, 1.0)
    b = np.asarray(r.render_frame(view, proj, pos).color)
    ca, cb = a[48, 48], b[48, 48]
    assert ca[0] > ca[2] and cb[2] > cb[0]


def test_render_without_mesh_raises():
    from ash_tpu.errors import InvalidOperation

    r = Renderer(HeadlessSurface(32, 32))
    view, proj, pos = _camera(32, 32)
    with pytest.raises(InvalidOperation):
        r.render_frame(view, proj, pos)


def test_flat_shading_triangle_example():
    """01_triangle-style: flat vertex colors, no lighting."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=16,
            shadows_enabled=False, shading="flat",
        ),
    )
    r.set_mesh(Mesh.create_cube())
    view, proj, pos = _camera(64, 64, pos=(0, 0, 5))
    r.render_frame(view, proj, pos)
    img = surface.read_back()
    c = img[32, 32]
    # Front face is pure red vertex color.
    assert c[0] > 200 and c[1] < 30 and c[2] < 30


def test_resize_respecializes_and_clears_temporal_state():
    """Resize mid-run: new extent renders; TAA history/prev-depth dropped
    (reference swapchain-recreate analog, renderer.rs:1093-1545)."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.initialize_hdr()
    r.set_taa_enabled(True)
    r.set_occlusion_culling(True)
    view, proj, pos = _camera(64, 64)
    r.render_frame(view, proj, pos)
    r.render_frame(view, proj, pos)
    assert r._taa_history is not None and r._taa_history.shape[0] == 64

    surface.resize(96, 80)
    view, proj, pos = _camera(96, 80)
    # Async resize (deferred swapchain rebuild): the first frames after a
    # resize keep the OLD-extent programs (no compile stall) and present
    # SCALED to the new extent; once the background warm finishes, the
    # next frame adopts the native programs.
    out = r.render_frame(view, proj, pos)
    img = surface.read_back()
    assert img.shape == (80, 96, 4)  # surface contract from frame 1
    assert out.color.shape[0] == 64  # still the old program (no stall)
    assert r.wait_resize(timeout=120.0)
    out = r.render_frame(view, proj, pos)
    img = surface.read_back()
    assert img.shape == (80, 96, 4)
    assert out.history.shape == (80, 96, 3)  # native + temporal state reset


def test_resize_sync_mode_respecializes_immediately():
    """async_resize=False keeps the old blocking behavior: the first
    frame after a resize is already native."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False, async_resize=False),
    )
    r.set_mesh(Mesh.create_cube())
    view, proj, pos = _camera(64, 64)
    r.render_frame(view, proj, pos)
    surface.resize(96, 80)
    view, proj, pos = _camera(96, 80)
    out = r.render_frame(view, proj, pos)
    assert out.color.shape[:2] == (80, 96)
    assert surface.read_back().shape == (80, 96, 4)


def test_async_resize_during_animation():
    """An app on the dynamic (update_transforms_trs) path resizes: the
    transition presents at the new extent, the background warm also
    compiles the DYNAMIC program at the new shape, and post-swap
    animated frames render natively."""
    from ash_tpu import Material
    from ash_tpu.render import RenderCommand

    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0.7, 0.4, 0.2, 1.0)))
    n = 3
    t = np.zeros((n, 3), np.float32)
    q = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    s = np.ones((n, 3), np.float32)
    cmds = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = t[i, 0] = float(i) - 1.0
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    view, proj, pos = _camera(64, 64)
    r.render_frame(view, proj, pos)  # static frame sets _warm_args
    r.update_transforms_trs(t, q, s)
    r.render_frame(view, proj, pos)  # dynamic frame sets _dyn_args

    surface.resize(96, 80)
    view, proj, pos = _camera(96, 80)
    r.update_transforms_trs(t, q, s)
    out = r.render_frame(view, proj, pos)  # transition: old extent serves
    assert surface.read_back().shape == (80, 96, 4)
    assert out.color.shape[0] == 64
    assert r.wait_resize(timeout=180.0)
    r.update_transforms_trs(t, q, s)
    out = r.render_frame(view, proj, pos)  # post-swap animated frame
    assert out.color.shape[:2] == (80, 96)
    assert surface.read_back().shape == (80, 96, 4)


def test_async_resize_every_frame_presents_and_swaps():
    """During the transition EVERY frame presents at the requested
    extent while the old program keeps serving; after the warm lands the
    loop swaps to the native program (the reference's deferred rebuild,
    renderer.rs:1093-1545). A second resize mid-transition retargets."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    view, proj, pos = _camera(64, 64)
    r.render_frame(view, proj, pos)

    surface.resize(128, 96)
    view, proj, pos = _camera(128, 96)
    served_old = 0
    for _ in range(50):
        out = r.render_frame(view, proj, pos)
        assert surface.read_back().shape == (96, 128, 4)
        if out.color.shape[0] != 96:
            served_old += 1
        if out.color.shape[0] == 96:
            break
        r.wait_resize(timeout=10.0)
    assert out.color.shape[:2] == (96, 128), "never swapped to native"
    # At least the first transition frame must have come from the old
    # program (proving no synchronous re-specialization happened).
    assert served_old >= 1
