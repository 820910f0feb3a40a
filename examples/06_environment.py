"""Example 06: image-based lighting + full material range.

A grid of spheres sweeping metallic x roughness under a sky environment —
the classic IBL calibration scene (split-sum: irradiance + prefiltered
radiance + the BRDF LUT from shaders/brdf_lut.frag, which the reference
shipped without a consumer).

Run: python examples/06_environment.py [out.png]
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


def sky_environment(h=64, w=128) -> np.ndarray:
    env = np.zeros((h, w, 3), np.float32)
    v = np.linspace(0, 1, h)[:, None, None]
    env[:] = np.where(
        v < 0.5,
        np.array([0.25, 0.45, 1.1]) * (1.2 - v),  # sky gradient
        np.array([0.4, 0.32, 0.22]) * np.ones_like(v),  # ground
    )
    env[6:12, 18:30] = [10.0, 9.0, 7.0]  # sun
    return env


def main(out="environment.png"):
    surface = HeadlessSurface(640, 400)
    # Dense spheres concentrate many triangles per screen tile: raise the
    # per-tile capacity accordingly (the renderer logs a warning on
    # overflow otherwise).
    r = Renderer(
        surface,
        RendererConfig(shadows_enabled=False, max_tris_per_tile=2048),
    )
    r.register_mesh_handle(0, Mesh.create_sphere(segments=32, rings=16))

    n = 5
    commands = []
    for i in range(n):  # metallic columns
        for j in range(n):  # roughness rows
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] *= 0.8
            m[:3, 3] = [(i - (n - 1) / 2) * 2.1, ((n - 1) / 2 - j) * 2.1, 0]
            mat = Material(
                color=(0.9, 0.6, 0.3, 1.0),
                metallic=i / (n - 1),
                roughness=max(j / (n - 1), 0.05),
            )
            mid = i * n + j + 1
            r.register_material_handle(mid, mat)
            commands.append(RenderCommand(mesh=0, transform=m, material=mid))
    r.submit_render_commands(commands)
    r.set_environment_map(sky_environment())
    r.initialize_hdr()

    cam = Camera.new([0, 0, 13.5], [0, 0, 0], 640 / 400)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    surface.save_png(out)
    print(f"wrote {out} (metallic -> right, roughness -> down)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
