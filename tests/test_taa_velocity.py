"""TAA motion vectors: camera/object reprojection feeding the resolve."""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def _renderer(w=96, h=64):
    surface = HeadlessSurface(w, h)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.9, 0.4, 0.2, 1.0)))
    r.initialize_hdr()
    r.set_taa_enabled(True)
    return r, surface


def test_static_scene_velocity_near_zero():
    r, _ = _renderer()
    cam = Camera.new([0, 0, 5], [0, 0, 0], 96 / 64)
    v, p = cam.view_matrix(), cam.projection_matrix()
    r.render_frame(v, p, cam.position)
    out = r.render_frame(v, p, cam.position)
    # Static camera + static object: motion is zero everywhere.
    # (TAA jitter perturbs only the render projection, not the motion math.)
    assert out.history is not None


def test_camera_motion_keeps_history_aligned():
    """With motion vectors, a panning camera reprojects history correctly:
    the converged TAA image stays close to the ground truth (no smearing)."""
    r, surface = _renderer()
    for i in range(8):
        cam = Camera.new([0.04 * i, 0, 5], [0.04 * i, 0, 0], 96 / 64)
        out = r.render_frame(
            cam.view_matrix(), cam.projection_matrix(), cam.position
        )
    taa_img = surface.read_back().astype(np.float32)

    # Ground truth: same final camera, TAA off.
    surface2 = HeadlessSurface(96, 64)
    r2 = Renderer(
        surface2,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r2.set_mesh(Mesh.create_cube())
    r2.set_material(Material(color=(0.9, 0.4, 0.2, 1.0)))
    r2.initialize_hdr()
    cam = Camera.new([0.28, 0, 5], [0.28, 0, 0], 96 / 64)
    r2.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    truth = surface2.read_back().astype(np.float32)

    err = np.abs(taa_img[..., :3] - truth[..., :3]).mean()
    assert err < 12.0, f"TAA under camera motion drifted: mean err {err}"


def test_object_motion_velocity():
    """A translating object produces nonzero velocity at its pixels."""
    import jax.numpy as jnp

    from ash_tpu.render.frame import compiled_frame

    r, _ = _renderer()
    cam = Camera.new([0, 0, 5], [0, 0, 0], 96 / 64)
    v, p = cam.view_matrix(), cam.projection_matrix()
    r.render_frame(v, p, cam.position)
    r.transform.position = np.array([0.4, 0, 0], np.float32)
    out = r.render_frame(v, p, cam.position)
    # History must still be produced and image valid.
    img = r.read_back()
    assert img is not None and img.shape == (64, 96, 4)
