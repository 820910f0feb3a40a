"""Stress regression: large mesh + large texture upload
(reference examples/crash_repro.rs: 209,668 vertices / 982,380 indices plus a
2048x2048 texture upload had to complete without crashing,
crash_repro.rs:31-33).

Run: python examples/crash_repro.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Mesh, TextureData, VertexArrays
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

TARGET_VERTS = 209_668
TARGET_INDICES = 982_380


def build_stress_mesh() -> Mesh:
    """Synthetic mesh matching the reference's stress counts."""
    rng = np.random.default_rng(0)
    n_tris = TARGET_INDICES // 3
    # A perturbed sphere point cloud fanned into triangles.
    pos = rng.normal(size=(TARGET_VERTS, 3)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    pos *= 1.0 + 0.05 * rng.random(( TARGET_VERTS, 1)).astype(np.float32)
    idx = rng.integers(0, TARGET_VERTS, size=(n_tris, 3), dtype=np.int64)
    tex = TextureData(
        width=2048, height=2048,
        pixels=rng.integers(0, 256, (2048, 2048, 4), dtype=np.uint8),
    )
    return Mesh(
        name="stress",
        vertices=VertexArrays(
            position=pos,
            normal=pos.copy(),
            uv=np.abs(pos[:, :2]),
            color=np.ones((TARGET_VERTS, 3), np.float32),
            tangent=np.tile(np.array([1, 0, 0, 1], np.float32),
                            (TARGET_VERTS, 1)),
        ),
        indices=idx.reshape(-1).astype(np.uint32),
        texture_data=tex,
    )


def main():
    t0 = time.perf_counter()
    mesh = build_stress_mesh()
    print(f"mesh: {len(mesh.vertices)} verts, {mesh.num_triangles} tris, "
          f"2048^2 texture ({time.perf_counter()-t0:.2f}s)")
    assert len(mesh.vertices) == TARGET_VERTS
    assert mesh.indices.shape[0] == TARGET_INDICES

    surface = HeadlessSurface(640, 480)
    r = Renderer(
        surface,
        RendererConfig(shadow_resolution=1024, max_tris_per_tile=512),
    )
    t0 = time.perf_counter()
    r.set_mesh(mesh)  # upload: scene pack + mip chain + bindless registration
    cam = Camera.new([0, 0, 3.5], [0, 0, 0], 640 / 480)
    out = r.render_frame(
        cam.view_matrix(), cam.projection_matrix(), cam.position
    )
    out.image.block_until_ready()
    print(f"upload + first frame: {time.perf_counter()-t0:.2f}s, "
          f"covered {int(out.covered_pixels)} px, "
          f"binning overflow {int(out.binning_overflow)}")
    print("OK — no crash")


if __name__ == "__main__":
    main()
