"""Deterministic golden scenes for PSNR regression tests.

These mirror BASELINE.json's configs at reduced resolution. Golden PNGs live
in tests/golden/ (regenerate with `python tests/golden_scenes.py` after an
INTENTIONAL visual change and eyeball the diff). The PSNR >= 40 dB bar is the
BASELINE.json per-frame parity threshold.
"""

import os
import sys

if __name__ == "__main__":
    # Goldens are CPU-rendered for bit-determinism; force the backend before
    # jax can initialize (the ambient env points at a TPU).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ash_tpu import Material, Mesh  # noqa: E402
from ash_tpu.core.transform import Camera  # noqa: E402
from ash_tpu.render import (  # noqa: E402
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SIZE = (192, 128)  # (W, H)

# Overridden by the TPU parity gate (tools/tpu_parity.py) to re-render the
# same scenes with use_pallas=True on the real chip.
CONFIG_OVERRIDES = {}


def _cfg(**kw):
    kw.update(CONFIG_OVERRIDES)
    return RendererConfig(**kw)


def scene_cube_pbr():
    """02_cube config: red metallic cube + shadow map."""
    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=32,
                       shadow_resolution=256, shadow_tile=64,
                       shadow_max_tris_per_tile=32, use_pallas=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.8, 0.2, 0.2, 1.0), metallic=0.5,
                            roughness=0.5))
    cam = Camera.new([3.0, 2.2, 4.0], [0, 0, 0], SIZE[0] / SIZE[1])
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


def scene_flat_cube():
    """01_triangle config: flat vertex colors."""
    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=32,
                       shadows_enabled=False, shading="flat",
                       use_pallas=False),
    )
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([2.5, 1.8, 4.0], [0, 0, 0], SIZE[0] / SIZE[1])
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


def scene_full_frame():
    """Full frame: instanced grid + point lights + bloom + ACES + TAA."""
    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=64,
                       shadow_resolution=256, shadow_tile=64,
                       shadow_max_tris_per_tile=64, use_pallas=False),
    )
    r.register_mesh_handle(0, Mesh.create_cube())
    rng = np.random.default_rng(5)
    commands = []
    for i in range(27):
        z, rem = divmod(i, 9)
        y, x = divmod(rem, 3)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] *= 0.5
        m[:3, 3] = (np.array([x, y, z], np.float32) - 1.0) * 2.5
        mat = Material(
            color=(*(0.3 + 0.7 * rng.random(3)), 1.0),
            metallic=float(rng.random()),
            roughness=float(0.2 + 0.8 * rng.random()),
            emissive=(3.0, 1.5, 0.3, 1.0) if i == 13 else (0, 0, 0, 1),
        )
        r.register_material_handle(i + 1, mat)
        commands.append(RenderCommand(mesh=0, transform=m, material=i + 1))
    r.submit_render_commands(commands)
    r.shadow_feature.set_scene_bounds([0, 0, 0], 8.0)
    r.add_point_light([0, 4, 4], color=(1, 0.9, 0.7), intensity=6, radius=16)
    r.initialize_hdr()
    r.set_taa_enabled(True)
    cam = Camera.new([6.0, 4.5, 7.0], [0, 0, 0], SIZE[0] / SIZE[1])
    for _ in range(3):
        r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


def scene_textured():
    """Textured cube (checkerboard albedo through the bindless pool)."""
    from ash_tpu import TextureData

    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=32,
                       shadows_enabled=False, use_pallas=False),
    )
    mesh = Mesh.create_named_cube("TexturedCube")
    mesh.texture_data = TextureData.checkerboard(size=64, cell=8)
    r.set_mesh(mesh)
    r.set_material(Material(color=(1.0, 0.9, 0.8, 1.0), roughness=0.6))
    cam = Camera.new([2.6, 1.8, 3.4], [0, 0, 0], SIZE[0] / SIZE[1])
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


def scene_glass_and_lights():
    """Transparent pane over a cube, plus point + spot lights (exercises
    two-layer blending and the Forward+ shading loop)."""
    from ash_tpu.core import maths

    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=64,
                       shadows_enabled=False, use_pallas=False),
    )
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_mesh_handle(1, Mesh.create_plane("pane", size=2.0))
    r.register_material_handle(1, Material(color=(0.85, 0.3, 0.2, 1.0),
                                           roughness=0.4))
    r.register_material_handle(2, Material(color=(0.4, 0.7, 1.0, 0.35),
                                           roughness=0.1))
    cube = np.eye(4, dtype=np.float32)
    cube[:3, 3] = [0, 0, -1.5]
    pane = (
        maths.mat4_translation([0, 0, 1.2])
        @ maths.mat4_from_quat(
            maths.quat_from_axis_angle([1, 0, 0], np.pi / 2)
        )
    ).astype(np.float32)
    r.submit_render_commands([
        RenderCommand(mesh=0, transform=cube, material=1),
        RenderCommand(mesh=1, transform=pane, material=2),
    ])
    r.add_point_light([2, 2, 2], color=(1, 0.9, 0.7), intensity=4, radius=12)
    r.add_spot_light([-2, 2, 3], direction=[0.5, -0.5, -1],
                     color=(0.4, 0.6, 1.0), intensity=6, radius=15,
                     inner_cone_angle=0.3, outer_cone_angle=0.6)
    cam = Camera.new([1.5, 1.2, 5.0], [0, 0, 0], SIZE[0] / SIZE[1])
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


def scene_k_layer_stack():
    """Three half-transparent panes over an opaque floor through the
    4-layer depth peel (K-layer OIT; locks transparency_layers > 2)."""
    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=32,
             shadows_enabled=False, transparency_layers=4,
             use_pallas=False),
    )
    r.register_mesh_handle(0, Mesh.create_plane("pane", size=1.6))
    colors = [(1, 0.2, 0.2, 0.45), (0.2, 1, 0.2, 0.45),
              (0.2, 0.2, 1, 0.45), (0.9, 0.9, 0.9, 1.0)]
    commands = []
    for i, col in enumerate(colors):
        r.register_material_handle(i + 1, Material(color=col, roughness=0.5))
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.15 * i - 0.2, 1.5 - 0.5 * i, 0]
        commands.append(RenderCommand(mesh=0, transform=m, material=i + 1))
    r.submit_render_commands(commands)
    cam = Camera.new([0.6, 4.6, 0.9], [0, 0.2, 0], SIZE[0] / SIZE[1])
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


def scene_aniso16():
    """Grazing-angle checkered ground plane with the reference sampler's
    16x anisotropy (texture.rs:313-327). The low view angle makes the
    pixel footprint ~16:1 along V — exactly where trilinear over-blurs and
    the 16-tap footprint assembly preserves the checker rows (VERDICT r2
    item 8: golden evidence AT 16x)."""
    from ash_tpu import TextureData

    surface = HeadlessSurface(*SIZE)
    r = Renderer(
        surface,
        _cfg(tile_h=8, tile_w=64, max_tris_per_tile=32,
             shadows_enabled=False, use_pallas=False, max_anisotropy=16),
    )
    mesh = Mesh.create_plane("Ground", size=24.0)
    mesh.texture_data = TextureData.checkerboard(size=256, cell=8)
    r.set_mesh(mesh)
    r.set_material(Material(color=(1.0, 1.0, 1.0, 1.0), roughness=0.8))
    cam = Camera.new([0.0, 0.35, 6.0], [0, 0.0, -6.0], SIZE[0] / SIZE[1])
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface


SCENES = {
    "cube_pbr": scene_cube_pbr,
    "flat_cube": scene_flat_cube,
    "full_frame": scene_full_frame,
    "textured": scene_textured,
    "glass_and_lights": scene_glass_and_lights,
    "k_layer_stack": scene_k_layer_stack,
    "aniso16": scene_aniso16,
}


def generate():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in SCENES.items():
        surface = fn()
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        surface.save_png(path)
        print(f"wrote {path}")


if __name__ == "__main__":
    generate()
