"""FXAA, PostProcessingFeature, pass profiler."""

import jax.numpy as jnp
import numpy as np

from ash_tpu.ops.fxaa import fxaa


def test_fxaa_smooths_jaggies_preserves_flats():
    # Diagonal staircase edge (the jaggies FXAA targets).
    yy, xx = np.mgrid[0:16, 0:16]
    img = jnp.asarray(
        np.repeat((xx > yy)[..., None], 3, axis=-1).astype(np.float32)
    )
    out = np.asarray(fxaa(img))
    diff = np.abs(out - np.asarray(img)).max(-1)
    # Staircase pixels moved toward the local average.
    assert diff[8, 8] > 0.01 or diff[8, 9] > 0.01
    # Flat interior untouched.
    np.testing.assert_allclose(out[2, 12], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[12, 2], 0.0, atol=1e-6)


def test_fxaa_low_contrast_untouched():
    img = jnp.full((8, 8, 3), 0.5).at[:, 4:].set(0.51)
    out = np.asarray(fxaa(img))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)


def test_post_processing_feature_applies():
    from ash_tpu import Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
    from ash_tpu.render.features import PostProcessingConfig, PostProcessingFeature

    r = Renderer(
        HeadlessSurface(48, 48),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                       shadows_enabled=False),
    )
    feat = PostProcessingFeature(
        PostProcessingConfig(exposure=1.5, gamma=2.0, enable_fxaa=True)
    )
    feat.apply_to(r)
    assert r.hdr_enabled and r.fxaa_enabled
    assert r.tonemapping_exposure == 1.5 and r.tonemapping_gamma == 2.0
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert r.read_back().shape == (48, 48, 4)


def test_pass_profiler():
    from ash_tpu import Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    r = Renderer(
        HeadlessSurface(64, 64),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                       shadow_resolution=64, shadow_tile=32,
                       shadow_max_tris_per_tile=16),
    )
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
    timings = r.profile_passes(
        cam.view_matrix(), cam.projection_matrix(), cam.position, n=1
    )
    for scope in ("Vertex", "ShadowEnd", "Setup", "Binning", "Raster",
                  "GBuffer", "SceneEnd"):
        assert scope in timings and timings[scope] >= 0.0
    # Results surfaced to diagnostics.
    assert r.diagnostics().gpu_timings.passes == timings
    assert "Raster" in r.diagnostics().gpu_timings.format_line()


def test_anisotropic_filtering():
    """Aniso sampling: grazing-angle texture stays sharper than trilinear
    (less over-blurred), and max_anisotropy=1 matches the old path."""
    import jax.numpy as jnp

    from ash_tpu.core.texture import TextureData, mip_chain
    from ash_tpu.ops.shade import _sample_map
    from ash_tpu.ops.texture_sample import build_pool

    # Horizontal stripes: all variation along Y (the NARROW footprint axis),
    # constant along X (the wide axis) — the case anisotropy preserves.
    px = np.zeros((64, 64, 4), np.uint8)
    px[(np.arange(64) // 8 % 2 == 0), :, :3] = 255
    px[..., 3] = 255
    stripes = TextureData(64, 64, px, srgb=False).to_linear_f32()
    pool = build_pool([mip_chain(None, stripes)])
    idx = jnp.zeros((4, 4), jnp.int32)
    # Sample in the middle of a white stripe.
    uv = jnp.full((4, 4, 2), 4.5 / 64).at[..., 0].set(0.3)
    # Anisotropic footprint: wide in x (16 texels), narrow in y (1 texel).
    ddx = jnp.tile(jnp.asarray([16 / 64, 0.0]), (4, 4, 1))
    ddy = jnp.tile(jnp.asarray([0.0, 1 / 64]), (4, 4, 1))

    tri = np.asarray(_sample_map(pool, idx, uv, ddx, ddy, max_aniso=1))
    aniso = np.asarray(_sample_map(pool, idx, uv, ddx, ddy, max_aniso=8))
    assert tri.shape == aniso.shape == (4, 4, 4)
    # Trilinear picks mip log2(16)=4 (stripes averaged to ~0.5); aniso picks
    # mip log2(16/8)=1 where the white stripe is preserved (~1.0).
    assert aniso[0, 0, 0] > tri[0, 0, 0] + 0.2, (tri[0, 0], aniso[0, 0])
    # Isotropic footprint: both paths identical.
    iso = jnp.tile(jnp.asarray([2 / 64, 0.0]), (4, 4, 1))
    isoy = jnp.tile(jnp.asarray([0.0, 2 / 64]), (4, 4, 1))
    a = np.asarray(_sample_map(pool, idx, uv, iso, isoy, max_aniso=1))
    b = np.asarray(_sample_map(pool, idx, uv, iso, isoy, max_aniso=8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_renderer_max_anisotropy_config():
    from ash_tpu import Mesh, TextureData, Material
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    surface = HeadlessSurface(48, 48)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                       shadows_enabled=False, max_anisotropy=4),
    )
    mesh = Mesh.create_plane("floor", size=20.0)
    mesh.texture_data = TextureData.checkerboard(size=32, cell=4)
    r.set_mesh(mesh)
    cam = Camera.new([0, 0.5, 6], [0, 0, 0], 1.0)  # grazing view
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert surface.read_back() is not None
