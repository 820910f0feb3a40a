"""Example 02: PBR cube with an orbiting camera
(reference examples/02_cube.rs).

Same scene: red metallic cube (color [0.8, 0.2, 0.2], metallic 0.5,
roughness 0.5 — 02_cube.rs:45-51), camera orbiting at radius 5, height 2
(02_cube.rs:79-89). Renders N frames headlessly and saves the last.

Run: python examples/02_cube.py [frames] [out.png]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Material, Mesh
from ash_tpu.core import maths
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def main(frames=30, out="cube.png"):
    frames = int(frames)
    surface = HeadlessSurface(640, 480)
    renderer = Renderer(surface, RendererConfig(shadow_resolution=1024))
    renderer.set_mesh(Mesh.create_cube())
    renderer.set_material(
        Material(color=(0.8, 0.2, 0.2, 1.0), metallic=0.5, roughness=0.5)
    )

    for i in range(frames):
        t = i / 30.0
        camera_pos = np.array(
            [5.0 * np.sin(t), 2.0, 5.0 * np.cos(t)], np.float32
        )
        view = maths.look_at_rh(camera_pos, [0, 0, 0], [0, 1, 0])
        proj = maths.perspective_rh(np.deg2rad(45), 640 / 480, 0.5, 100.0)
        proj[1, 1] *= -1.0  # Vulkan Y-flip (02_cube.rs:88)
        renderer.render_frame(view, proj, camera_pos)

    surface.save_png(out)
    stats = renderer.diagnostics().frame_stats
    print(f"wrote {out} after {frames} frames "
          f"(avg {stats.frame_time_ms:.2f} ms)")


if __name__ == "__main__":
    main(*sys.argv[1:3])
