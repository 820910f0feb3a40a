"""Example 01: minimal render loop (reference examples/01_triangle.rs).

The reference's "triangle" example actually shows the renderer's default
seeded cube with a static camera (renderer.rs:678); here we render the same
cube flat-shaded headlessly and save a PNG.

Run: python examples/01_triangle.py [out.png]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def main(out="triangle.png"):
    surface = HeadlessSurface(640, 480)
    renderer = Renderer(
        surface, RendererConfig(shading="flat", shadows_enabled=False)
    )
    renderer.set_mesh(Mesh.create_cube())

    camera = Camera.default(aspect=640 / 480)
    camera.position = np.array([0, 0, 5], np.float32)
    # The Vulkan Y-flip lives inside Camera.projection_matrix
    # (reference 01_triangle.rs:54 does it by hand).
    renderer.render_frame(
        camera.view_matrix(), camera.projection_matrix(), camera.position
    )
    surface.save_png(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
