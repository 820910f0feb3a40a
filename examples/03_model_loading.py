"""Example 03: GLB model loading (reference examples/03_model_loading.rs).

The reference's version is a TODO stub (03_model_loading.rs:44-45); this one
actually loads a .glb with its PBR texture maps through the bindless table
and renders it. Without an argument it builds a small textured demo GLB
in-memory.

Run: python examples/03_model_loading.py [model.glb] [out.png]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def _demo_glb() -> bytes:
    sys.path.insert(0, "tests")
    from test_gltf import build_quad_glb

    return build_quad_glb(with_texture=True)


def main(path=None, out="model.png"):
    if path:
        mesh = Mesh.from_gltf(path)
    else:
        from ash_tpu.core.gltf import load_glb_mesh

        mesh = load_glb_mesh(_demo_glb())
    print(f"loaded '{mesh.name}': {len(mesh.vertices)} verts, "
          f"{mesh.num_triangles} tris, "
          f"textured={mesh.texture_data is not None}")

    surface = HeadlessSurface(640, 480)
    renderer = Renderer(surface, RendererConfig(shadow_resolution=1024))
    renderer.set_mesh(mesh)

    center, extents = mesh.bounds()
    radius = float(np.linalg.norm(extents)) or 1.0
    cam = Camera.new(center + np.array([0, radius, radius * 2.5], np.float32),
                     center, 640 / 480)
    renderer.render_frame(
        cam.view_matrix(), cam.projection_matrix(), cam.position
    )
    surface.save_png(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
