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
