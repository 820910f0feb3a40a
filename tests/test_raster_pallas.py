"""Pallas rasterizer vs the jnp scan oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from ash_tpu.core.mesh import Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.ops import binning, geometry, raster
from ash_tpu.ops.raster_pallas import rasterize_pallas


def _setup_scene(cam_pos, w=96, h=64):
    cube = Mesh.create_cube()
    cam = Camera.new(np.asarray(cam_pos, np.float32), [0, 0, 0], w / h)
    vp = cam.projection_matrix() @ cam.view_matrix()
    tv = geometry.transform_vertices(
        jnp.eye(4)[None], jnp.asarray(vp),
        jnp.asarray(cube.vertices.position), jnp.asarray(cube.vertices.normal),
        jnp.asarray(cube.vertices.tangent), jnp.zeros(24, jnp.int32),
    )
    setup = geometry.triangle_setup(
        tv.clip, jnp.asarray(cube.triangle_indices), jnp.ones(12, bool), w, h
    )
    bins = binning.bin_triangles(setup.bbox, setup.valid, h, w, 16, 32, 16)
    return setup, bins, h, w


def test_pallas_matches_scan_oracle():
    setup, bins, h, w = _setup_scene((3.0, 2.0, 4.0))
    ref = raster.rasterize(setup, bins, h, w, 16, 32)
    got = rasterize_pallas(setup, bins, h, w, 16, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), atol=1e-6
    )


def test_pallas_matches_oracle_head_on():
    setup, bins, h, w = _setup_scene((0.0, 0.0, 5.0))
    ref = raster.rasterize(setup, bins, h, w, 16, 32)
    got = rasterize_pallas(setup, bins, h, w, 16, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))


def test_pallas_band_offset():
    """y0-banded rendering matches the full-frame oracle rows."""
    setup, bins_full, h, w = _setup_scene((3.0, 2.0, 4.0))
    ref = raster.rasterize(setup, bins_full, h, w, 16, 32)
    band_h = h // 2
    for band in range(2):
        y0 = band * band_h
        bins = binning.bin_triangles(
            setup.bbox, setup.valid, band_h, w, 16, 32, 16, y0=y0
        )
        got = rasterize_pallas(
            setup, bins, band_h, w, 16, 32, y0=y0, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(got.tri_id), np.asarray(ref.tri_id)[y0 : y0 + band_h]
        )
