"""Compute-pass tests: utils, Hi-Z, light culling, occlusion culling."""

import jax.numpy as jnp
import numpy as np

from ash_tpu.core import maths
from ash_tpu.ops import compute_utils as cu
from ash_tpu.ops import hiz, light_cull, occlusion


# ---------------------------------------------------------------- utils


def test_exclusive_prefix_sum():
    x = jnp.asarray([1, 0, 2, 3])
    np.testing.assert_array_equal(
        np.asarray(cu.exclusive_prefix_sum(x)), [0, 1, 1, 3]
    )


def test_prefix_sum_compact():
    mask = jnp.asarray([False, True, False, True, True, False])
    idx, count = cu.prefix_sum_compact(mask, 6)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(idx), [1, 3, 4, -1, -1, -1])


def test_prefix_sum_compact_overflow():
    mask = jnp.ones(8, bool)
    idx, count = cu.prefix_sum_compact(mask, 4)
    assert int(count) == 4
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])


def test_frustum_planes_and_sphere_test():
    proj = maths.perspective_rh(np.deg2rad(60), 1.0, 0.1, 100.0)
    view = maths.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    planes = cu.extract_frustum_planes(jnp.asarray(proj @ view))
    inside = cu.sphere_in_frustum(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]), planes
    )
    behind = cu.sphere_in_frustum(
        jnp.asarray([[0.0, 0.0, 50.0]]), jnp.asarray([1.0]), planes
    )
    assert bool(inside[0]) and not bool(behind[0])


def test_aabb_frustum_positive_vertex():
    proj = maths.perspective_rh(np.deg2rad(60), 1.0, 0.1, 100.0)
    view = maths.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    planes = cu.extract_frustum_planes(jnp.asarray(proj @ view))
    c = jnp.asarray([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    e = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    vis = np.asarray(cu.aabb_in_frustum(c, e, planes))
    assert vis[0] and not vis[1]


# ---------------------------------------------------------------- Hi-Z


def test_hiz_pyramid_max_reduction():
    depth = jnp.ones((16, 16)).at[4, 4].set(0.25)
    pyr = hiz.build_hiz(depth, max_levels=5)
    assert pyr.levels == 5
    # Max-reduction: the far value (1.0) dominates everywhere above level 0.
    assert float(pyr.level(4).reshape(-1)[0]) == 1.0
    np.testing.assert_allclose(np.asarray(pyr.level(0)), np.asarray(depth))
    # Level 1 keeps the max of each 2x2 block: block with 0.25 still 1.0.
    assert float(pyr.level(1)[2, 2]) == 1.0


def test_hiz_sample_level():
    depth = jnp.full((8, 8), 0.5)
    pyr = hiz.build_hiz(depth, max_levels=4)
    v = hiz.sample_level(
        pyr, jnp.asarray([0, 2]), jnp.asarray([0.5, 0.5]), jnp.asarray([0.5, 0.5])
    )
    np.testing.assert_allclose(np.asarray(v), [0.5, 0.5])


# ---------------------------------------------------------------- light culling


def _camera_mats():
    proj = maths.perspective_rh(np.deg2rad(60), 1.0, 0.1, 100.0)
    proj[1, 1] *= -1  # Vulkan flip as the renderer does
    view = maths.look_at_rh([0, 0, 10], [0, 0, 0], [0, 1, 0])
    return view, proj


def test_tile_depth_bounds():
    depth = jnp.ones((32, 32)).at[0, 0].set(0.2)
    dmin, dmax = light_cull.tile_depth_bounds(depth, tile=16)
    assert dmin.shape == (2, 2)
    np.testing.assert_allclose(float(dmin[0, 0]), 0.2, rtol=1e-6)
    assert float(dmax[0, 0]) == 1.0
    assert float(dmin[1, 1]) == 1.0


def test_cull_lights_center_vs_far():
    view, proj = _camera_mats()
    # Fill the depth buffer with the depth of world origin (the geometry the
    # lights could illuminate) — empty tiles (depth 1.0 = far plane) rightly
    # cull everything nearer.
    clip = proj @ view @ np.array([0, 0, 0, 1], np.float32)
    d0 = float(clip[2] / clip[3])
    depth = jnp.full((64, 64), d0)
    # Light at origin (on the geometry), and one far off to the side.
    lights = np.zeros((2, 16), np.float32)
    lights[0, 0:4] = [0, 0, 0, 3.0]
    lights[0, 15] = 1.0
    lights[1, 0:4] = [500, 0, 0, 3.0]
    lights[1, 15] = 1.0
    tl = light_cull.cull_lights(
        jnp.asarray(lights), jnp.asarray(view), jnp.asarray(np.linalg.inv(proj)),
        depth, 64, 64, max_per_tile=8,
    )
    counts = np.asarray(tl.counts)
    # Center tiles see light 0; no tile sees light 1.
    assert counts.max() >= 1
    assert not np.asarray(tl.mask)[..., 1].any()
    center = np.asarray(tl.indices)[2, 2]
    assert 0 in center.tolist()


def test_disabled_light_skipped():
    view, proj = _camera_mats()
    clip = proj @ view @ np.array([0, 0, 0, 1], np.float32)
    depth = jnp.full((32, 32), float(clip[2] / clip[3]))
    lights = np.zeros((1, 16), np.float32)
    lights[0, 0:4] = [0, 0, 0, 50.0]
    lights[0, 15] = 0.0  # disabled
    tl = light_cull.cull_lights(
        jnp.asarray(lights), jnp.asarray(view), jnp.asarray(np.linalg.inv(proj)),
        depth, 32, 32, max_per_tile=4,
    )
    assert int(np.asarray(tl.counts).sum()) == 0


def test_pack_tile_buffer_layout():
    """[count, idx...] per tile (light_culling.comp:194-202)."""
    mask = jnp.zeros((1, 2, 3), bool).at[0, 0, 2].set(True)
    tl = light_cull.TileLights(
        mask=mask,
        indices=jnp.asarray([[[2, -1], [-1, -1]]], jnp.int32),
        counts=jnp.asarray([[1, 0]], jnp.int32),
    )
    buf = np.asarray(light_cull.pack_tile_buffer(tl))
    assert buf.shape == (2, 3)
    np.testing.assert_array_equal(buf[0], [1, 2, 0])
    np.testing.assert_array_equal(buf[1], [0, 0, 0])


# ---------------------------------------------------------------- occlusion


def test_occlusion_cull_frustum_and_hiz():
    view, proj = _camera_mats()
    vp = jnp.asarray(proj @ view)
    # Depth buffer: near wall covering the whole screen at depth 0.1.
    pyr = hiz.build_hiz(jnp.full((64, 64), 0.1))
    centers = jnp.asarray([
        [0.0, 0.0, 0.0],     # in frustum but behind the wall -> occluded
        [500.0, 0.0, 0.0],   # outside frustum
    ])
    extents = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    models = jnp.tile(jnp.eye(4), (2, 1, 1))
    res = occlusion.cull_objects(
        centers, extents, models, jnp.ones(2, bool), vp, pyr, 64, 64
    )
    np.testing.assert_array_equal(np.asarray(res.visibility), [0, 0])
    assert int(res.visible_count) == 0


def test_occlusion_visible_with_far_wall():
    view, proj = _camera_mats()
    vp = jnp.asarray(proj @ view)
    pyr = hiz.build_hiz(jnp.ones((64, 64)))  # empty depth -> nothing occludes
    centers = jnp.asarray([[0.0, 0.0, 0.0]])
    extents = jnp.asarray([[1.0, 1.0, 1.0]])
    models = jnp.eye(4)[None]
    res = occlusion.cull_objects(
        centers, extents, models, jnp.ones(1, bool), vp, pyr, 64, 64
    )
    assert int(res.visible_count) == 1
    np.testing.assert_array_equal(np.asarray(res.draw_list)[:1], [0])


def test_occlusion_disabled_flag():
    view, proj = _camera_mats()
    vp = jnp.asarray(proj @ view)
    pyr = hiz.build_hiz(jnp.ones((32, 32)))
    res = occlusion.cull_objects(
        jnp.zeros((1, 3)), jnp.ones((1, 3)), jnp.eye(4)[None],
        jnp.zeros(1, bool), vp, pyr, 32, 32,
    )
    assert int(res.visible_count) == 0


# ---------------------------------------------------------------- e2e lights


def test_e2e_point_lights():
    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.1, 0.1, 0.1, 1.0)))
    cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
    base = np.asarray(
        r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position).color
    )
    # A strong green point light right in front of the cube.
    r.add_point_light([0, 0, 2.5], color=(0, 4, 0), intensity=5.0, radius=8.0)
    lit = np.asarray(
        r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position).color
    )
    c = 32
    assert lit[c, c, 1] > base[c, c, 1] + 0.05, (base[c, c], lit[c, c])
    # Light is green: green gain exceeds red gain.
    assert (lit[c, c, 1] - base[c, c, 1]) > (lit[c, c, 0] - base[c, c, 0])
