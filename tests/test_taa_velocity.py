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


def test_jitter_is_constant_in_ndc_for_perspective():
    """The TAA jitter must shift NDC by exactly 2*jitter/screen at EVERY
    depth. The reference adds the offset to the translation column
    (temporal_aa.rs:144-156), which under a perspective matrix divides by
    w = |z| — distant geometry got almost no jitter while the resolve
    compensated the full amount (the reference never wired TAA, so the
    quirk was latent there; documented deviation)."""
    from ash_tpu.core import maths
    from ash_tpu.render.temporal_aa import TaaConfig, TemporalAA

    taa = TemporalAA(TaaConfig(enabled=True))
    taa.begin_frame()
    proj = maths.perspective_rh(np.deg2rad(60), 16 / 9, 0.1, 100.0)
    pj = taa.jitter_projection(proj, 1920, 1080)
    expect = taa.current_jitter * np.array([2.0 / 1920, 2.0 / 1080])
    for z in (-0.5, -5.0, -50.0):
        v = np.array([0.3, -0.2, z, 1.0], np.float32)
        a = proj @ v
        b = pj @ v
        ndc_shift = b[:2] / b[3] - a[:2] / a[3]
        np.testing.assert_allclose(ndc_shift, expect, atol=1e-6)
    # Orthographic projections keep the exact translation-column form.
    ortho = maths.orthographic_rh(-1, 1, -1, 1, 0.1, 10.0)
    po = taa.jitter_projection(ortho, 1920, 1080)
    for z in (-0.5, -5.0):
        v = np.array([0.3, -0.2, z, 1.0], np.float32)
        shift = (po @ v)[:2] / (po @ v)[3] - (ortho @ v)[:2] / (ortho @ v)[3]
        np.testing.assert_allclose(shift, expect, atol=1e-6)


def test_clear_point_lights_keeps_spot_lights():
    surface = HeadlessSurface(96, 64)
    r = Renderer(surface, RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=32, shadows_enabled=False))
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([0, 1.5, 5], [0, 0, 0], 96 / 64)
    v, p = cam.view_matrix(), cam.projection_matrix()
    base = np.asarray(r.render_frame(v, p, cam.position).image).copy()
    r.add_spot_light([0, 3, 3], direction=[0, -1, -1], color=[1, 0, 0],
                     intensity=8.0, radius=12.0)
    lit = np.asarray(r.render_frame(v, p, cam.position).image).copy()
    assert not np.array_equal(base, lit), "spot light had no effect"
    r.add_point_light([2, 2, 2], color=[0, 1, 0], intensity=5.0, radius=8.0)
    r.clear_point_lights()  # must NOT remove the spot light
    still_lit = np.asarray(r.render_frame(v, p, cam.position).image)
    np.testing.assert_array_equal(lit, still_lit)
    r.clear_lights()
    dark = np.asarray(r.render_frame(v, p, cam.position).image)
    np.testing.assert_array_equal(base, dark)
