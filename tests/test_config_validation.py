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
