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
