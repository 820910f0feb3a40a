"""Rasterizer tests: geometry transform, binning, visibility buffer."""

import jax.numpy as jnp
import numpy as np
import pytest

from ash_tpu.core import maths
from ash_tpu.core.mesh import Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.ops import binning, geometry, raster


def _cube_scene(width=128, height=128, cam_pos=(0, 0, 5)):
    cube = Mesh.create_cube()
    cam = Camera.new(np.array(cam_pos, np.float32), [0, 0, 0], width / height)
    view = cam.view_matrix()
    proj = cam.projection_matrix()
    view_proj = proj @ view

    models = jnp.eye(4)[None]  # one draw, identity model
    vert_draw = jnp.zeros(len(cube.vertices), jnp.int32)
    tv = geometry.transform_vertices(
        models,
        jnp.asarray(view_proj),
        jnp.asarray(cube.vertices.position),
        jnp.asarray(cube.vertices.normal),
        jnp.asarray(cube.vertices.tangent),
        vert_draw,
    )
    tri_v = jnp.asarray(cube.triangle_indices)
    setup = geometry.triangle_setup(
        tv.clip, tri_v, jnp.ones(tri_v.shape[0], bool), width, height
    )
    return cube, tv, tri_v, setup


def test_vertex_transform_world_positions():
    cube, tv, _, _ = _cube_scene()
    np.testing.assert_allclose(
        np.asarray(tv.world), cube.vertices.position, atol=1e-5
    )
    # Normals unchanged by identity model.
    np.testing.assert_allclose(
        np.asarray(tv.normal), cube.vertices.normal, atol=1e-5
    )


def test_backface_culling_keeps_front_faces():
    """From +Z the camera sees the front (+z, tris 0-1); back/left/right/top/
    bottom either backface or are edge-on.

    This also pins the Vulkan facing convention (front <=> area2 < 0)."""
    _, _, _, setup = _cube_scene()
    valid = np.asarray(setup.valid)
    assert valid[0] and valid[1], "front face must survive back-face culling"
    assert not valid[2] and not valid[3], "back face must be culled"
    # Front faces have negative area2 in y-down fb coords.
    assert np.asarray(setup.area2)[0] < 0


def test_binning_covers_center_tile():
    _, _, _, setup = _cube_scene()
    bins = binning.bin_triangles(
        setup.bbox, setup.valid, 128, 128, 32, 64, max_per_tile=16
    )
    ids = np.asarray(bins.tri_ids)
    counts = np.asarray(bins.counts)
    assert int(bins.overflow) == 0
    # Centre tiles (the cube projects near the middle) must list tris 0 and 1.
    ty, tx = binning.grid_shape(128, 128, 32, 64)
    center = (ty // 2) * tx  # tile row 2, col 0 covers x in [0,64)
    assert counts[center] >= 1
    listed = set(ids[ids >= 0].tolist())
    assert listed == {0, 1}
    # Ascending order per tile.
    row = ids[center][ids[center] >= 0]
    assert list(row) == sorted(row)


def test_rasterize_cube_visibility():
    _, _, _, setup = _cube_scene()
    bins = binning.bin_triangles(
        setup.bbox, setup.valid, 128, 128, 32, 64, max_per_tile=16
    )
    vis = raster.rasterize(setup, bins, 128, 128, 32, 64)
    tid = np.asarray(vis.tri_id)
    depth = np.asarray(vis.depth)
    assert tid.shape == (128, 128)
    # Centre pixel hits the front face.
    assert tid[64, 64] in (0, 1)
    assert 0.0 < depth[64, 64] < 1.0
    # Corners are background.
    assert tid[0, 0] == -1 and depth[0, 0] == 1.0
    assert tid[127, 127] == -1
    # The cube's projected extent is a centered square: coverage is symmetric
    # up to boundary pixels (edges pass exactly through pixel centers and
    # float rounding may differ by one pixel on opposite sides).
    cover = tid >= 0
    assert (cover != cover[::-1, :]).sum() <= 64
    assert (cover != cover[:, ::-1]).sum() <= 64
    ys, xs = np.where(cover)
    assert ys.min() + ys.max() == 127 and xs.min() + xs.max() == 127
    frac = cover.mean()
    assert 0.1 < frac < 0.9, f"cube coverage {frac} looks wrong"


def test_rasterize_depth_test_between_two_faces():
    """Viewed from an angle, front (+z) face must win against the right
    (+x) face only where they overlap... actually they never overlap; instead
    check both are visible and depths are consistent."""
    _, _, _, setup = _cube_scene(cam_pos=(4, 2.5, 5))
    bins = binning.bin_triangles(
        setup.bbox, setup.valid, 128, 128, 32, 64, max_per_tile=16
    )
    vis = raster.rasterize(setup, bins, 128, 128, 32, 64)
    tid = np.asarray(vis.tri_id)
    seen = set(tid[tid >= 0].tolist())
    # Front (0,1), right (8,9 -> actually 16-19 verts = tris 8,9), top (4,5).
    assert {0, 1} & seen, "front face visible"
    assert {8, 9} & seen, "right face visible"
    assert {4, 5} & seen, "top face visible"
    # Back faces never appear.
    assert not ({2, 3, 6, 7, 10, 11} & seen)


def test_rasterize_near_plane_crossing():
    """Clipless rasterization: a triangle crossing the near plane stays
    valid (full-screen bbox) and rasterizes only its in-front part; a fully
    behind triangle is rejected."""
    clip = jnp.asarray(
        [[0.0, 0.0, 0.5, 1.0], [1.0, 0.0, 0.5, 1.0], [0.0, 1.0, -0.5, -1.0]],
        jnp.float32,
    )
    tri_v = jnp.asarray([[0, 1, 2]], jnp.int32)
    setup = geometry.triangle_setup(
        clip, tri_v, jnp.ones(1, bool), 64, 64, cull_mode="none"
    )
    assert bool(setup.valid[0]), "near-crossing triangle must survive"
    np.testing.assert_allclose(np.asarray(setup.bbox[0]), [0, 0, 64, 64])
    bins = binning.bin_triangles(
        setup.bbox, setup.valid, 64, 64, 16, 32, 8
    )
    vis = raster.rasterize(setup, bins, 64, 64, 16, 32)
    assert (np.asarray(vis.tri_id) >= 0).any(), "front part rasterizes"

    behind = jnp.asarray(
        [[0.0, 0.0, 0.5, -1.0], [1.0, 0.0, 0.5, -1.0], [0.0, 1.0, 0.5, -2.0]],
        jnp.float32,
    )
    setup_b = geometry.triangle_setup(
        behind, tri_v, jnp.ones(1, bool), 64, 64, cull_mode="none"
    )
    assert not bool(setup_b.valid[0])


def test_ground_plane_through_camera():
    """A huge ground plane extending behind the camera renders (the case
    near-plane DISCARD broke: reference scenes always have one)."""
    plane = Mesh.create_plane(size=30.0)
    cam = Camera.new([6.0, 5.0, 10.0], [0, 0, -5], 96 / 64)
    vp = cam.projection_matrix() @ cam.view_matrix()
    tv = geometry.transform_vertices(
        jnp.eye(4)[None], jnp.asarray(vp),
        jnp.asarray(plane.vertices.position), jnp.asarray(plane.vertices.normal),
        jnp.asarray(plane.vertices.tangent), jnp.zeros(4, jnp.int32),
    )
    setup = geometry.triangle_setup(
        tv.clip, jnp.asarray(plane.triangle_indices), jnp.ones(2, bool),
        96, 64,
    )
    assert np.asarray(setup.valid).any()
    bins = binning.bin_triangles(setup.bbox, setup.valid, 64, 96, 16, 32, 8)
    vis = raster.rasterize(setup, bins, 64, 96, 16, 32)
    cover = (np.asarray(vis.tri_id) >= 0).mean()
    assert cover > 0.3, f"ground plane should fill the lower view: {cover}"
    # Depth increases toward the horizon.
    d = np.asarray(vis.depth)
    tid = np.asarray(vis.tri_id)
    rows = np.where((tid >= 0).any(axis=1))[0]
    top, bottom = rows.min(), rows.max()
    assert d[bottom][tid[bottom] >= 0].min() < d[top][tid[top] >= 0].max()


def test_perspective_weights_sum_to_one():
    lam = (jnp.float32(0.2), jnp.float32(0.3), jnp.float32(0.5))
    inv_w = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    w0, w1, w2 = geometry.perspective_weights(lam, inv_w)
    np.testing.assert_allclose(float(w0 + w1 + w2), 1.0, atol=1e-6)
    # Nearer vertices (bigger 1/w) pull weight toward themselves.
    assert float(w2) > 0.5


def test_untile_roundtrip():
    img = jnp.arange(13 * 29, dtype=jnp.float32).reshape(13, 29)
    tiled = raster.tile_image(img, 8, 16)
    back = raster.untile(tiled, 13, 29, 8, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_two_level_binning_matches_dense():
    """bin_triangles_two_level reproduces the dense binner exactly whenever
    nothing overflows the coarse cap (random bboxes, odd grid sizes)."""
    rng = np.random.default_rng(5)
    t = 300
    x0 = rng.random(t) * 200
    y0 = rng.random(t) * 150
    bbox = np.stack(
        [x0, y0, x0 + rng.random(t) * 60, y0 + rng.random(t) * 40], axis=1
    ).astype(np.float32)
    valid = rng.random(t) > 0.2
    for band_y0, h in ((0, 160), (64, 48)):
        dense = binning.bin_triangles(
            jnp.asarray(bbox), jnp.asarray(valid), h, 208, 16, 32, 64,
            y0=band_y0,
        )
        two = binning.bin_triangles_two_level(
            jnp.asarray(bbox), jnp.asarray(valid), h, 208, 16, 32, 64,
            y0=band_y0, coarse_tiles=(3, 2), coarse_cap=t,
        )
        np.testing.assert_array_equal(
            np.asarray(two.tri_ids), np.asarray(dense.tri_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(two.counts), np.asarray(dense.counts)
        )
        assert int(two.overflow) == int(dense.overflow)


def test_two_level_binning_coarse_overflow_reported():
    """Coarse-cap drops surface through `overflow` instead of vanishing."""
    t = 64
    # All triangles overlap the same pixel -> one coarse tile holds all.
    bbox = np.tile(np.array([[1.0, 1.0, 3.0, 3.0]], np.float32), (t, 1))
    valid = np.ones(t, bool)
    two = binning.bin_triangles_two_level(
        jnp.asarray(bbox), jnp.asarray(valid), 64, 64, 16, 32, 64,
        coarse_cap=16,
    )
    assert int(two.overflow) >= t - 16


def test_binning_nearest_policy_keeps_closest():
    """cap 2, three stacked triangles: 'nearest' keeps the two closest
    (regardless of draw id), output still ascending id."""
    bbox = np.tile(np.array([[1.0, 1.0, 3.0, 3.0]], np.float32), (3, 1))
    valid = np.ones(3, bool)
    # id 0 farthest, id 2 nearest.
    keep = jnp.asarray(-np.array([0.9, 0.5, 0.1], np.float32))
    for fn in (
        binning.bin_triangles,
        lambda *a, **k: binning.bin_triangles_two_level(
            *a, coarse_cap=3, **k
        ),
    ):
        bins = fn(jnp.asarray(bbox), jnp.asarray(valid), 16, 32, 16, 32, 2,
                  keep_score=keep)
        ids = np.asarray(bins.tri_ids)[0]
        assert list(ids[:2]) == [1, 2], ids  # nearest two, ascending
        assert int(bins.overflow) == 1
        assert int(np.asarray(bins.counts)[0]) == 2


def test_binning_nearest_policy_no_overflow_matches_draw_order():
    """Without overflow the nearest policy returns identical bins."""
    rng = np.random.default_rng(11)
    t = 150
    x0 = rng.random(t) * 100
    y0 = rng.random(t) * 80
    bbox = np.stack(
        [x0, y0, x0 + rng.random(t) * 30, y0 + rng.random(t) * 20], axis=1
    ).astype(np.float32)
    valid = rng.random(t) > 0.3
    keep = jnp.asarray(-rng.random(t).astype(np.float32))
    a = binning.bin_triangles(
        jnp.asarray(bbox), jnp.asarray(valid), 96, 128, 16, 32, t
    )
    b = binning.bin_triangles(
        jnp.asarray(bbox), jnp.asarray(valid), 96, 128, 16, 32, t,
        keep_score=keep,
    )
    np.testing.assert_array_equal(np.asarray(a.tri_ids), np.asarray(b.tri_ids))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))


def test_nearest_policy_full_frame_renders():
    """End-to-end with binning_policy='nearest' on a tight cap: the cube
    still renders (front faces win) and drops are reported."""
    from ash_tpu import Material
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=4,
                       shadows_enabled=False, binning_policy="nearest"),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.9, 0.2, 0.2, 1.0)))
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    img = np.asarray(out.color)
    assert img[32, 32, 0] > 0.05  # front face survived the tight cap
