"""Light model completeness: spot lights, host light-culling parity consts."""

import numpy as np
import pytest

from ash_tpu.render.features.light_culling import (
    MAX_LIGHTS,
    MAX_LIGHTS_PER_TILE,
    TILE_SIZE,
    GpuLight,
    LightCullingPass,
    tile_buffer_len,
    tile_counts,
)
from ash_tpu.render.features.lighting import (
    DirectionalLight,
    PointLight,
    SpotLight,
)


def test_reference_constants():
    """light_culling.rs:17-23."""
    assert MAX_LIGHTS == 1024
    assert MAX_LIGHTS_PER_TILE == 256
    assert TILE_SIZE == 16


def test_tile_counts_1080p():
    """Reference test: 1920x1080 -> 120x68 tiles
    (light_culling.rs:252-277)."""
    assert tile_counts(1920, 1080) == (120, 68)
    assert tile_buffer_len(1920, 1080) == 120 * 68 * 257


def test_gpu_light_packing():
    """light_culling.rs:40-63 layouts."""
    p = GpuLight.from_point_light(
        PointLight(position=np.array([1, 2, 3], np.float32), intensity=2.0,
                   radius=7.0)
    )
    flat = p.flat()
    assert flat.shape == (16,)
    np.testing.assert_allclose(flat[:4], [1, 2, 3, 7])
    assert flat[7] == 2.0 and flat[11] == 0.0 and flat[15] == 1.0

    d = GpuLight.from_directional_light(DirectionalLight())
    assert d.flat()[11] == 2.0  # type directional
    assert d.flat()[3] == np.finfo(np.float32).max  # infinite radius

    s = GpuLight.from_spot_light(
        SpotLight(position=np.zeros(3), direction=np.array([0, -1, 0]),
                  inner_cone_angle=0.2, outer_cone_angle=0.4)
    )
    sf = s.flat()
    assert sf[11] == 1.0  # type spot
    np.testing.assert_allclose(sf[12:14], [0.2, 0.4])


def test_light_culling_pass_state():
    lc = LightCullingPass()
    lc.update_screen_size(1920, 1080)
    assert (lc.tiles_x, lc.tiles_y) == (120, 68)
    lc.set_lights([GpuLight.from_point_light(
        PointLight(position=np.zeros(3)))])
    packed = lc.packed_lights(pad_to=8)
    assert packed.shape == (8, 16)
    with pytest.raises(ValueError):
        lc.set_lights([GpuLight.from_point_light(
            PointLight(position=np.zeros(3)))] * (MAX_LIGHTS + 1))


def test_e2e_spot_light():
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
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position).color
    )
    # Narrow spot aimed at the cube's front face from the camera side.
    r.add_spot_light([0, 0, 3.5], direction=[0, 0, -1], color=(4, 0, 0),
                     intensity=6.0, radius=10.0,
                     inner_cone_angle=0.25, outer_cone_angle=0.5)
    lit = np.asarray(
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position).color
    )
    c = 32
    assert lit[c, c, 0] > base[c, c, 0] + 0.05, "spot lights the center"
    # Outside the cone (upper corner of the face) gains much less.
    corner_gain = lit[12, 12, 0] - base[12, 12, 0]
    center_gain = lit[c, c, 0] - base[c, c, 0]
    assert center_gain > corner_gain * 2


def test_beyond_32_lights_per_tile_all_contribute():
    """The shading loop honors the 256-lights-per-tile contract
    (light_culling.rs:17-23); round 1 silently dropped slots beyond 32."""
    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    def brightness(n_lights):
        surface = HeadlessSurface(64, 64)
        r = Renderer(
            surface,
            RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                           shadows_enabled=False),
        )
        r.set_mesh(Mesh.create_cube())
        r.set_material(Material(color=(0.05, 0.05, 0.05, 1.0)))
        cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
        for _ in range(n_lights):
            # All lights land in every covered tile.
            r.add_point_light([0, 0, 3.0], color=(1, 1, 1),
                              intensity=0.05, radius=20.0)
        out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                             cam.position)
        return float(np.asarray(out.color)[32, 32].sum())

    b32, b48 = brightness(32), brightness(48)
    # 48 identical lights must be measurably brighter than 32 (pre-fix both
    # rendered identically because slots 33+ were dropped).
    assert b48 > b32 * 1.2, (b32, b48)
