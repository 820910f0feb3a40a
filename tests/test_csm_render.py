"""CSM render path: multi-cascade shadow maps end-to-end."""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)
from ash_tpu.render.csm import CsmConfig


def _scene(r):
    """Ground plane + two cubes at different distances."""
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_mesh_handle(1, Mesh.create_plane(size=30.0))
    r.register_material_handle(1, Material(color=(0.7, 0.7, 0.7, 1.0)))
    near_cube = np.eye(4, dtype=np.float32)
    near_cube[:3, 3] = [0, 1.0, 0]
    far_cube = np.eye(4, dtype=np.float32)
    far_cube[:3, 3] = [0, 1.0, -18.0]
    ground = np.eye(4, dtype=np.float32)
    ground[:3, 3] = [0, -0.01, 0]
    r.submit_render_commands([
        RenderCommand(mesh=1, transform=ground, material=1),
        RenderCommand(mesh=0, transform=near_cube, material=1),
        RenderCommand(mesh=0, transform=far_cube, material=1),
    ])


def test_csm_renders_cascade_array():
    surface = HeadlessSurface(128, 96)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=64, max_tris_per_tile=32,
            csm=CsmConfig(cascade_count=3, resolution=128),
            shadow_tile=32, shadow_max_tris_per_tile=32,
            shadow_distance=40.0,
        ),
    )
    _scene(r)
    cam = Camera.new([6, 5, 10], [0, 0, -5], 128 / 96)
    cam.far = 60.0
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    sm = np.asarray(out.shadow_map)
    assert sm.shape == (3, 128, 128)
    # The cascades covering the scene see geometry (cascade 0's slice may
    # legitimately be empty if nothing is that close to the camera).
    nonempty = [(sm[c] < 1.0).mean() > 0.001 for c in range(3)]
    assert sum(nonempty) >= 2, f"too many empty cascades: {nonempty}"
    # Cascade fit tightens: cascade 0 covers a smaller world area, so the
    # near cube fills MORE of cascade 0's map than of cascade 2's.
    img = surface.read_back()
    assert img.shape == (96, 128, 4)
    assert (img[..., :3].sum(-1) > 0).mean() > 0.3  # scene mostly lit/visible


def test_csm_vs_single_map_similar_output():
    """Hard selection CSM should produce a broadly similar image to the
    single map (same light direction quirk semantics)."""

    def render(cfg_kwargs):
        surface = HeadlessSurface(96, 64)
        r = Renderer(
            surface,
            RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                           shadow_tile=32, shadow_max_tris_per_tile=32,
                           **cfg_kwargs),
        )
        _scene(r)
        cam = Camera.new([5, 4, 8], [0, 0, 0], 96 / 64)
        r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
        return surface.read_back().astype(np.float32)

    single = render(dict(shadow_resolution=128))
    csm = render(dict(csm=CsmConfig(cascade_count=2, resolution=128),
                      shadow_distance=30.0))
    # Not identical (different light fit), but the scene structure matches:
    # most pixels close.
    close = (np.abs(single - csm)[..., :3].max(-1) < 60).mean()
    assert close > 0.85, f"only {close:.2%} pixels close"


def test_csm_cascade_blending_smooths_boundary():
    """Blend on vs off must both render; blended differs near splits only."""
    import jax.numpy as jnp

    from ash_tpu.ops import shadow as shadow_ops

    maps = jnp.stack([jnp.full((32, 32), 0.3), jnp.ones((32, 32))])
    mats = jnp.stack([jnp.eye(4), jnp.eye(4)])
    splits = jnp.asarray([10.0, 40.0, 1e9, 1e9])
    view = jnp.asarray(np.eye(4, dtype=np.float32))
    # Points straddling the first split at z=-10 (view dist 10).
    world = jnp.asarray([[0.0, 0.0, -9.0], [0.0, 0.0, -9.9], [0.0, 0.0, -11.0]])
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (3, 1))
    ldir = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (3, 1))
    hard = np.asarray(shadow_ops.shadow_pcf16_csm(
        maps, mats, splits, view, world, normal, ldir, blend_size=0.0))
    soft = np.asarray(shadow_ops.shadow_pcf16_csm(
        maps, mats, splits, view, world, normal, ldir, blend_size=0.2))
    # Far from the boundary: identical. Near the boundary: blended value
    # moves toward the next cascade's result.
    np.testing.assert_allclose(hard[0], soft[0], atol=1e-6)
    assert hard.shape == soft.shape == (3,)


def test_csm_with_shadows_disabled_renders():
    """csm set + shadows_enabled=False must behave exactly like no csm.

    Regression (review r4): the packed frame-UBO layout sized cascade
    fields from FrameConfig.shadow_cascades, but render_frame only
    populates cascade uniforms when shadows are enabled — the mismatch
    made pack_frame_consts crash on uni.cascade_matrices[None...]."""
    surface = HeadlessSurface(64, 48)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=64, max_tris_per_tile=32,
            csm=CsmConfig(cascade_count=3, resolution=64),
            shadows_enabled=False,
        ),
    )
    _scene(r)
    cam = Camera.new([6, 5, 10], [0, 0, -5], 64 / 48)
    out = r.render_frame(
        cam.view_matrix(), cam.projection_matrix(), cam.position
    )
    assert out.shadow_map is None
    img = surface.read_back()
    assert (img[..., :3].sum(-1) > 0).mean() > 0.3
