"""Frame-config validation and lazy prelude exports."""

import numpy as np
import pytest


def test_transparency_layers_bounds():
    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    r = Renderer(
        HeadlessSurface(32, 32),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                       shadows_enabled=False, transparency_layers=9),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(1, 0, 0, 0.5)))  # forces blend path
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    with pytest.raises(ValueError, match="transparency_layers"):
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position)


def test_binning_policy_validated():
    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    r = Renderer(
        HeadlessSurface(32, 32),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                       shadows_enabled=False, binning_policy="closest"),
    )
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    with pytest.raises(ValueError, match="binning_policy"):
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position)


def test_lazy_prelude_exports():
    import ash_tpu

    for name in ("Renderer", "RendererConfig", "HeadlessSurface",
                 "FileStreamSurface", "RenderCommand", "SurfaceProvider"):
        assert getattr(ash_tpu, name) is not None
    with pytest.raises(AttributeError):
        ash_tpu.NotAThing


def test_host_caches_invalidate_on_scene_and_light_edits():
    """Round-2 host caches (stacked models / material flags / packed
    lights) must never serve stale data after submit_render_commands or
    light edits."""
    import numpy as np

    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import (
        HeadlessSurface, RenderCommand, Renderer, RendererConfig,
    )

    r = Renderer(
        HeadlessSurface(48, 48),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(1, 0, 0, 1)))
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    v, p = cam.view_matrix(), cam.projection_matrix()

    def submit(x):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = x
        r.submit_render_commands(
            [RenderCommand(mesh=0, transform=m, material=1)]
        )

    submit(0.0)
    a = np.asarray(r.render_frame(v, p, cam.position).image)
    a2 = np.asarray(r.render_frame(v, p, cam.position).image)
    np.testing.assert_array_equal(a, a2)  # cached path is deterministic
    submit(1.2)  # moved -> models cache must refresh
    b = np.asarray(r.render_frame(v, p, cam.position).image)
    assert not np.array_equal(a, b), "stale model-matrix cache"

    c0 = np.asarray(r.render_frame(v, p, cam.position).image)
    r.add_point_light([0.5, 1.0, 2.0], color=[0, 1, 0], intensity=5.0,
                      radius=8.0)
    c1 = np.asarray(r.render_frame(v, p, cam.position).image)
    assert not np.array_equal(c0, c1), "stale packed-light cache"
    r.clear_point_lights()
    c2 = np.asarray(r.render_frame(v, p, cam.position).image)
    np.testing.assert_array_equal(c0, c2)


def test_non_tile_aligned_resolutions():
    """Resolutions that are not multiples of the raster tile must render
    with exact output shapes (partial tiles are padded internally)."""
    import numpy as np

    from ash_tpu import Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    for w, h in ((333, 217), (97, 64)):
        r = Renderer(
            HeadlessSurface(w, h),
            RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                           shadows_enabled=False),
        )
        r.set_mesh(Mesh.create_cube())
        cam = Camera.new([0, 0, 4], [0, 0, 0], w / h)
        out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                             cam.position)
        assert np.asarray(out.image).shape == (h, w, 4)
        assert int(out.covered_pixels) > 100


def test_single_trace_cold_start_taa_and_occlusion():
    """Frame 1 must not use a different frame-program argument structure
    than steady state: with TAA + occlusion culling enabled, exactly ONE
    trace of the jitted frame program happens across frames 1..3 (the
    round-2 cold-start fix — a second trace cost ~23 s on the rich
    config)."""
    from ash_tpu import Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    r = Renderer(
        HeadlessSurface(64, 48),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadow_resolution=64, shadow_tile=32,
                       shadow_max_tris_per_tile=32),
    )
    r.set_mesh(Mesh.create_cube())
    r.initialize_hdr()
    r.set_taa_enabled(True)
    r.set_occlusion_culling(True)
    cam = Camera.new([0, 0, 4], [0, 0, 0], 64 / 48)
    # Post-enabled configs run the split band+finalize pair (parallel
    # cold-start compile); the single-trace property must hold for BOTH
    # programs: the warm-up's dummy arguments must be structurally
    # identical to steady state, and the config stable across frames.
    import ash_tpu.render.frame as frame_mod

    seen = []
    orig_band = frame_mod.compiled_band_packed
    orig_fin = frame_mod.compiled_finalize_packed

    def band_wrapper(config, effort=None):
        fn = orig_band(config, effort)
        seen.append(("band", fn))
        return fn

    def fin_wrapper(config, effort=None):
        fn = orig_fin(config, effort)
        seen.append(("fin", fn))
        return fn

    frame_mod.compiled_band_packed = band_wrapper
    frame_mod.compiled_finalize_packed = fin_wrapper
    try:
        for _ in range(3):
            r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                           cam.position)
    finally:
        frame_mod.compiled_band_packed = orig_band
        frame_mod.compiled_finalize_packed = orig_fin
    for kind in ("band", "fin"):
        fns = [fn for k, fn in seen if k == kind]
        assert fns, f"{kind} program never requested"
        # Tiered mode legitimately holds TWO variants per program — the
        # cold reduced-effort jit serving frames and the full-effort jit
        # compiled in the background for the race. More than two means
        # the config churned between frames (the regression this pins).
        distinct = {id(fn): fn for fn in fns}
        assert len(distinct) <= 2, "config changed between frames"
        for fn in distinct.values():
            traces = fn._cache_size()
            assert traces <= 1, f"{kind} program traced {traces}x (want 1)"
        serving = fns[0]  # frame 1's cold-tier jit serves every frame
        assert serving._cache_size() == 1, "serving program re-traced"
