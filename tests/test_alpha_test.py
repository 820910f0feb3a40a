"""Alpha-test (cutout) rendering: two-layer visibility + fallthrough."""

import numpy as np

from ash_tpu import Material, Mesh, TextureData
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def _cutout_texture(size=32, cell=8) -> TextureData:
    """Checkerboard ALPHA: opaque red / fully transparent cells."""
    yy, xx = np.mgrid[0:size, 0:size]
    solid = ((yy // cell + xx // cell) % 2).astype(np.uint8)
    px = np.zeros((size, size, 4), np.uint8)
    px[..., 0] = 255
    px[..., 3] = solid * 255
    return TextureData(size, size, px)


def _quad_mesh(name="cutout"):
    m = Mesh.create_plane(name, size=1.5)
    m.texture_data = _cutout_texture()
    return m


def _scene():
    surface = HeadlessSurface(96, 96)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    # Blue backdrop plane behind a cutout quad, camera above looking down.
    r.register_mesh_handle(0, _quad_mesh())
    back = Mesh.create_plane("backdrop", size=4.0)
    r.register_mesh_handle(1, back)
    r.register_material_handle(
        1, Material(color=(1, 0, 0, 1), alpha_cutoff=0.5)
    )
    r.register_material_handle(2, Material(color=(0.0, 0.0, 1.0, 1.0)))
    front = np.eye(4, dtype=np.float32)
    front[:3, 3] = [0, 1.0, 0]
    bottom = np.eye(4, dtype=np.float32)
    r.submit_render_commands([
        RenderCommand(mesh=0, transform=front, material=1),
        RenderCommand(mesh=1, transform=bottom, material=2),
    ])
    cam = Camera.new([0, 4.0, 0.01], [0, 0, 0], 1.0)
    return r, surface, cam


def test_cutout_shows_background_through_holes():
    r, surface, cam = _scene()
    out = r.render_frame(
        cam.view_matrix(), cam.projection_matrix(), cam.position
    )
    img = surface.read_back()
    center = img[20:76, 20:76]
    reds = (center[..., 0] > 100) & (center[..., 2] < 100)
    blues = (center[..., 2] > 100) & (center[..., 0] < 100)
    assert reds.mean() > 0.15, f"opaque cells visible: {reds.mean():.2%}"
    assert blues.mean() > 0.15, (
        f"backdrop must show through cutout holes: {blues.mean():.2%}"
    )


def test_no_cutoff_renders_texture_rgb_everywhere():
    """With alpha_cutoff=0 the same texture renders fully (no discard)."""
    r, surface, cam = _scene()
    r.register_material_handle(1, Material(color=(1, 0, 0, 1)))  # cutoff off
    front = np.eye(4, dtype=np.float32)
    front[:3, 3] = [0, 1.0, 0]
    r.submit_render_commands([
        RenderCommand(mesh=0, transform=front, material=1),
        RenderCommand(mesh=1, transform=np.eye(4, dtype=np.float32),
                      material=2),
    ])
    out = r.render_frame(
        cam.view_matrix(), cam.projection_matrix(), cam.position
    )
    img = surface.read_back()
    center = img[30:66, 30:66]
    blues = (center[..., 2] > 100) & (center[..., 0] < 100)
    assert blues.mean() < 0.02, "no holes without a cutoff"


def test_two_layer_raster_oracle():
    """layers=2 jnp vs pallas-interpret equality."""
    import jax.numpy as jnp

    from ash_tpu.ops import binning, geometry, raster
    from ash_tpu.ops.raster_pallas import rasterize_pallas

    cube = Mesh.create_cube()
    cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
    vp = cam.projection_matrix() @ cam.view_matrix()
    tv = geometry.transform_vertices(
        jnp.eye(4)[None], jnp.asarray(vp),
        jnp.asarray(cube.vertices.position), jnp.asarray(cube.vertices.normal),
        jnp.asarray(cube.vertices.tangent), jnp.zeros(24, jnp.int32),
    )
    setup = geometry.triangle_setup(
        tv.clip, jnp.asarray(cube.triangle_indices), jnp.ones(12, bool),
        64, 64, cull_mode="none",  # both faces -> two layers everywhere
    )
    bins = binning.bin_triangles(setup.bbox, setup.valid, 64, 64, 16, 32, 16)
    a = raster.rasterize(setup, bins, 64, 64, 16, 32, layers=2)
    b = rasterize_pallas(setup, bins, 64, 64, 16, 32, layers=2,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    np.testing.assert_array_equal(
        np.asarray(a.tri_id2), np.asarray(b.tri_id2)
    )
    # Where covered, the second layer is the back face (greater depth).
    covered = np.asarray(a.tri_id) >= 0
    l2 = np.asarray(a.tri_id2)
    d1, d2 = np.asarray(a.depth), np.asarray(a.depth2)
    have2 = covered & (l2 >= 0)
    assert have2.mean() > 0.1
    assert (d2[have2] >= d1[have2]).all()
