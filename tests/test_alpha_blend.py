"""Two-layer alpha blending (semi-transparent materials)."""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def _scene(front_alpha):
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.register_mesh_handle(0, Mesh.create_plane("quad", size=1.5))
    r.register_material_handle(1, Material(color=(1, 0, 0, front_alpha)))
    r.register_material_handle(2, Material(color=(0, 0, 1, 1.0)))
    # Camera above looking down; red quad above a blue quad.
    top = np.eye(4, dtype=np.float32)
    top[:3, 3] = [0, 1.0, 0]
    bottom = np.eye(4, dtype=np.float32)
    r.submit_render_commands([
        RenderCommand(mesh=0, transform=top, material=1),
        RenderCommand(mesh=0, transform=bottom, material=2),
    ])
    cam = Camera.new([0, 4, 0.01], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color), surface


def test_opaque_front_hides_back():
    color, _ = _scene(front_alpha=1.0)
    c = color[32, 32]
    assert c[0] > c[2] * 2, f"opaque red wins: {c}"


def test_transparent_front_blends_with_back():
    solid, _ = _scene(front_alpha=1.0)
    blended, _ = _scene(front_alpha=0.5)
    c = blended[32, 32]
    s = solid[32, 32]
    # Half-transparent red over blue: blue channel appears, red drops.
    assert c[2] > s[2] + 0.02, f"blue shows through: {c} vs {s}"
    assert c[0] < s[0] - 0.02, f"red reduced: {c} vs {s}"
    # Fully transparent: only blue.
    clear, _ = _scene(front_alpha=0.0)
    cc = clear[32, 32]
    assert cc[2] > cc[0] * 2, f"alpha 0 front is invisible: {cc}"


def _stack_scene(transparency_layers, use_pallas=False):
    """THREE half-transparent panes over an opaque base: needs K=4 peel
    layers to composite exactly; K=2 drops the middle surfaces."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False,
                       transparency_layers=transparency_layers,
                       use_pallas=use_pallas),
    )
    r.register_mesh_handle(0, Mesh.create_plane("quad", size=1.5))
    colors = [(1, 0, 0, 0.5), (0, 1, 0, 0.5), (0, 0, 1, 0.5),
              (1, 1, 1, 1.0)]
    commands = []
    for i, col in enumerate(colors):
        r.register_material_handle(i + 1, Material(color=col))
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0, 1.5 - 0.5 * i, 0]
        commands.append(RenderCommand(mesh=0, transform=m, material=i + 1))
    r.submit_render_commands(commands)
    cam = Camera.new([0, 4.5, 0.01], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color)


def test_k_layer_stack_exact_at_four():
    """K=4 sees all four surfaces; K=2 only two — colors must differ, and
    K=4 must show contribution from every pane (r, g, b all nonzero)."""
    k4 = _stack_scene(4)[32, 32]
    k2 = _stack_scene(2)[32, 32]
    assert k4[0] > 0.01 and k4[1] > 0.01 and k4[2] > 0.01, k4
    # The two-layer approximation misses the middle surfaces.
    assert not np.allclose(k4, k2, atol=5e-3), (k4, k2)


def test_k_layer_pallas_matches_scan():
    """Pallas K-layer kernel (interpret mode on CPU) == scan oracle."""
    scan = _stack_scene(4, use_pallas=False)
    import ash_tpu.ops.raster_pallas as rp
    import functools
    orig = rp.rasterize_pallas
    rp_interp = functools.partial(orig, interpret=True)
    import ash_tpu.render.frame as frame_mod
    saved = frame_mod.rasterize_pallas
    frame_mod.rasterize_pallas = rp_interp
    try:
        pallas = _stack_scene(4, use_pallas=True)
    finally:
        frame_mod.rasterize_pallas = saved
    assert np.allclose(scan, pallas, atol=1e-5), (
        np.abs(scan - pallas).max()
    )


def test_transparent_over_background():
    """Transparent surface with nothing behind blends with the clear color."""
    surface = HeadlessSurface(48, 48)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.0, 1.0, 0.0, 0.4)))
    cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    c = np.asarray(out.color)[24, 24]
    # 40% of the shaded green over black: dimmer than opaque but nonzero.
    assert 0.005 < c[1] < 0.6, c
