"""Example 04: the full frame — instanced scene, shadows, Forward+ point
lights, HDR bloom + ACES tonemap + TAA (BASELINE.json's "Full frame" config;
in the reference these passes existed but were never wired together,
SURVEY §3.2).

Run: python examples/04_full_frame.py [objects] [out.png]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def main(objects=64, out="full_frame.png"):
    objects = int(objects)
    surface = HeadlessSurface(640, 480)
    r = Renderer(surface, RendererConfig(shadow_resolution=1024))

    r.register_mesh_handle(0, Mesh.create_cube())
    rng = np.random.default_rng(11)
    side = int(np.ceil(objects ** (1 / 3)))
    commands = []
    for i in range(objects):
        z, rem = divmod(i, side * side)
        y, x = divmod(rem, side)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] *= 0.5
        m[:3, 3] = (np.array([x, y, z], np.float32) - (side - 1) / 2) * 2.5
        mat = Material(
            color=(*(0.3 + 0.7 * rng.random(3)), 1.0),
            metallic=float(rng.random()),
            roughness=float(0.2 + 0.8 * rng.random()),
            emissive=(2.0, 1.0, 0.2, 1.0) if i % 17 == 0 else (0, 0, 0, 1),
        )
        r.register_material_handle(i + 1, mat)
        commands.append(RenderCommand(mesh=0, transform=m, material=i + 1))
    r.submit_render_commands(commands)
    r.shadow_feature.set_scene_bounds([0, 0, 0], side * 2.5)

    # Forward+ point lights.
    r.add_point_light([0, side * 1.5, 0], color=(1, 0.8, 0.6), intensity=8,
                      radius=side * 4.0)
    r.add_point_light([-side, 0, side], color=(0.2, 0.4, 1.0), intensity=6,
                      radius=side * 3.0)

    # HDR post chain + TAA.
    r.initialize_hdr()
    r.set_taa_enabled(True)
    r.set_bloom_intensity(0.6)

    ext = side * 2.5
    cam = Camera.new([ext * 1.2, ext * 0.9, ext * 1.4], [0, 0, 0], 640 / 480)
    cam.far = ext * 8
    for _ in range(4):  # a few frames so TAA history converges
        r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)

    surface.save_png(out)
    print(f"wrote {out} ({objects} objects, 2 point lights, bloom+ACES+TAA)")


if __name__ == "__main__":
    main(*sys.argv[1:3])
