"""Property-based fuzzing of the raster stack.

Random triangle soups — including behind-camera vertices, near-plane
crossers, degenerate slivers, and offscreen geometry — must satisfy:

- the Pallas kernel (interpret mode) matches the jnp scan oracle exactly
  (same visibility ids, same depths);
- two-level binning produces the same per-tile lists as the dense binner
  whenever nothing overflows;
- rasterized coverage matches an f64 analytic inside-test for pixels
  away from triangle edges.

The fixed-seed scenes complement the handcrafted cases in
tests/test_raster.py / test_raster_pallas.py: they sweep configurations
nobody thought to write down.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ash_tpu.ops import binning, geometry, raster
from ash_tpu.ops.raster_pallas import rasterize_pallas

W, H = 96, 64


def _random_soup(seed, n_tris=40, behind_frac=0.2):
    """Random clip-space triangle soup. A `behind_frac` share of vertices
    get negative w (behind the camera) so near-plane crossers appear."""
    rng = np.random.default_rng(seed)
    v = n_tris * 3
    w = rng.uniform(0.5, 5.0, v).astype(np.float32)
    behind = rng.random(v) < behind_frac
    w = np.where(behind, -rng.uniform(0.2, 2.0, v), w).astype(np.float32)
    x = (rng.uniform(-1.3, 1.3, v) * np.abs(w)).astype(np.float32)
    y = (rng.uniform(-1.3, 1.3, v) * np.abs(w)).astype(np.float32)
    z = (rng.uniform(0.0, 1.0, v) * np.abs(w)).astype(np.float32)
    clip = np.stack([x, y, z, w], axis=-1)
    tri_v = np.arange(v, dtype=np.int32).reshape(n_tris, 3)
    return jnp.asarray(clip), jnp.asarray(tri_v)


@pytest.mark.parametrize("seed", range(6))
def test_pallas_matches_oracle_random_soup(seed):
    clip, tri_v = _random_soup(seed)
    setup = geometry.triangle_setup(
        clip, tri_v, jnp.ones(tri_v.shape[0], bool), W, H, cull_mode="none"
    )
    bins = binning.bin_triangles(
        setup.bbox, setup.valid, H, W, 16, 32, max_per_tile=64
    )
    assert int(bins.overflow) == 0, "raise max_per_tile for this fuzz"
    ref = raster.rasterize(setup, bins, H, W, 16, 32)
    got = rasterize_pallas(setup, bins, H, W, 16, 32, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got.tri_id), np.asarray(ref.tri_id)
    )
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), atol=1e-6
    )


@pytest.mark.parametrize("seed", range(6))
def test_pallas_matches_oracle_two_layers(seed):
    clip, tri_v = _random_soup(seed + 100, n_tris=30)
    setup = geometry.triangle_setup(
        clip, tri_v, jnp.ones(tri_v.shape[0], bool), W, H, cull_mode="none"
    )
    bins = binning.bin_triangles(
        setup.bbox, setup.valid, H, W, 16, 32, max_per_tile=64
    )
    ref = raster.rasterize(setup, bins, H, W, 16, 32, layers=2)
    got = rasterize_pallas(setup, bins, H, W, 16, 32, interpret=True,
                           layers=2)
    for li in range(2):
        rd, rt = ref.layer(li)
        gd, gt = got.layer(li)
        np.testing.assert_array_equal(np.asarray(gt), np.asarray(rt))
        np.testing.assert_allclose(np.asarray(gd), np.asarray(rd),
                                   atol=1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_two_level_binning_matches_dense_random(seed):
    rng = np.random.default_rng(seed)
    t = 120
    x0 = rng.uniform(-40, W + 10, t).astype(np.float32)
    y0 = rng.uniform(-40, H + 10, t).astype(np.float32)
    bw = rng.uniform(0, 80, t).astype(np.float32)
    bh = rng.uniform(0, 60, t).astype(np.float32)
    bbox = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], axis=-1))
    valid = jnp.asarray(rng.random(t) > 0.1)
    dense = binning.bin_triangles(bbox, valid, H, W, 8, 32,
                                  max_per_tile=128)
    two = binning.bin_triangles_two_level(bbox, valid, H, W, 8, 32,
                                          max_per_tile=128,
                                          coarse_tiles=(4, 2))
    assert int(dense.overflow) == 0 and int(two.overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(two.counts), np.asarray(dense.counts)
    )
    np.testing.assert_array_equal(
        np.asarray(two.tri_ids), np.asarray(dense.tri_ids)
    )


@pytest.mark.parametrize("seed", range(6))
def test_coverage_matches_analytic_inside_test(seed):
    """A single front-facing on-screen triangle: every pixel center more
    than 0.5px from all edges must agree with an exact f64 inside test."""
    rng = np.random.default_rng(seed + 7)
    # Screen-space triangle with decent area, mapped back to clip w=1.
    while True:
        pts = rng.uniform([8, 8], [W - 8, H - 8], (3, 2)).astype(np.float64)
        d1, d2 = pts[1] - pts[0], pts[2] - pts[0]
        area = 0.5 * abs(d1[0] * d2[1] - d1[1] * d2[0])
        if area > 150:
            break
    # clip = (ndc, z, w=1): ndc from pixel centers (inverse of viewport).
    ndc = np.zeros((3, 4), np.float32)
    ndc[:, 0] = pts[:, 0] / (0.5 * W) - 1.0
    ndc[:, 1] = pts[:, 1] / (0.5 * H) - 1.0
    ndc[:, 2] = 0.5
    ndc[:, 3] = 1.0
    clip = jnp.asarray(ndc)
    tri_v = jnp.asarray([[0, 1, 2]], jnp.int32)
    setup = geometry.triangle_setup(clip, tri_v, jnp.ones(1, bool), W, H,
                                    cull_mode="none")
    bins = binning.bin_triangles(setup.bbox, setup.valid, H, W, 16, 32, 16)
    vis = raster.rasterize(setup, bins, H, W, 16, 32)
    tri_id = np.asarray(vis.tri_id)

    px = np.arange(W)[None, :] + 0.5
    py = np.arange(H)[:, None] + 0.5
    e = []
    for i in range(3):
        a, b = pts[i], pts[(i + 1) % 3]
        # signed distance of pixel centers from edge ab (f64)
        n = np.array([b[1] - a[1], a[0] - b[0]])
        n = n / np.linalg.norm(n)
        e.append((px - a[0]) * n[0] + (py - a[1]) * n[1])
    e = np.stack(e)
    inside = np.all(e > 0.5, axis=0) | np.all(e < -0.5, axis=0)
    outside = np.any(e > 0.5, axis=0) & np.any(e < -0.5, axis=0)
    covered = tri_id >= 0
    # Unambiguously inside pixels must be covered; unambiguous outside not
    # (the two sets are disjoint by construction).
    assert np.all(covered[inside]), "analytic-inside pixel not rasterized"
    assert not np.any(covered[outside]), "rasterized outside"


@pytest.mark.parametrize("seed", range(3))
def test_packed_gbuffer_bit_identical(seed):
    """gbuffer_packed=True changes only the FETCH SCHEDULE (one wide
    per-triangle-record gather instead of ~8 scattered ones); every
    interpolated value must be bit-identical."""
    import numpy as np

    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import (
        HeadlessSurface,
        RenderCommand,
        Renderer,
        RendererConfig,
    )

    rng = np.random.default_rng(seed + 11)

    def build(packed):
        surface = HeadlessSurface(96, 64)
        r = Renderer(surface, RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=64,
            shadow_resolution=64, shadow_tile=32,
            shadow_max_tris_per_tile=64, gbuffer_packed=packed))
        r.register_mesh_handle(0, Mesh.create_cube())
        r.register_material_handle(1, Material(color=(0.8, 0.4, 0.2, 1)))
        cmds = []
        for _ in range(9):
            m = np.eye(4, dtype=np.float32)
            m[:3, 3] = rng.uniform([-2, -1, -3], [2, 1, 0], 3)
            cmds.append(RenderCommand(mesh=0, transform=m, material=1))
        r.submit_render_commands(cmds)
        r.initialize_hdr()
        r.set_taa_enabled(True)  # exercises prev_clip/velocity packing
        return r, surface

    cam = Camera.new([0, 1.5, 6], [0, 0, 0], 96 / 64)
    v, p = cam.view_matrix(), cam.projection_matrix()
    state = rng.bit_generator.state
    r0, s0 = build(False)
    for _ in range(2):
        r0.render_frame(v, p, cam.position)
    base = s0.read_back().copy()
    rng.bit_generator.state = state
    r1, s1 = build(True)
    for _ in range(2):
        r1.render_frame(v, p, cam.position)
    np.testing.assert_array_equal(base, s1.read_back())
