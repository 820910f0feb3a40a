"""1M-triangle synthetic: the two-level binner's scale check.

VERDICT r1 item 3 done-criterion: a 1M-triangle scene renders at 1080p
within HBM. A 709x709 displaced-sphere grid = 1,002,528 triangles /
502,681 vertices through the full PBR + shadow pipeline.

Run: python examples/08_million_tris.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Material, Mesh, VertexArrays
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def build_sphere_grid(n: int) -> Mesh:
    rng = np.random.default_rng(1)
    theta = np.linspace(0.25, np.pi - 0.25, n, dtype=np.float32)
    phi = np.linspace(0.0, 2 * np.pi, n, dtype=np.float32)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    r = 1.0 + 0.05 * rng.standard_normal((n, n)).astype(np.float32)
    pos = np.stack(
        [r * np.sin(tt) * np.cos(pp), r * np.cos(tt),
         r * np.sin(tt) * np.sin(pp)], axis=-1,
    ).reshape(-1, 3)
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    v00 = (ii * n + jj).reshape(-1)
    v01, v10 = v00 + 1, v00 + n
    v11 = v10 + 1
    idx = np.stack(
        [np.stack([v00, v10, v01], 1), np.stack([v01, v10, v11], 1)], axis=1
    ).reshape(-1, 3).astype(np.uint32)
    nrm = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    nv = pos.shape[0]
    return Mesh(
        name="mega",
        vertices=VertexArrays(
            position=pos, normal=nrm,
            uv=np.zeros((nv, 2), np.float32),
            color=np.ones((nv, 3), np.float32),
            tangent=np.tile(np.array([1, 0, 0, 1], np.float32), (nv, 1)),
        ),
        indices=idx.reshape(-1),
    )


def main():
    t0 = time.perf_counter()
    mesh = build_sphere_grid(709)
    print(f"mesh: {len(mesh.vertices)} verts, {mesh.num_triangles} tris "
          f"({time.perf_counter()-t0:.1f}s)")
    assert mesh.num_triangles >= 1_000_000

    surface = HeadlessSurface(1920, 1080)
    # At ~1.2 tris/pixel the silhouette stacks tens of thousands of
    # sub-pixel triangles into single tiles. binning_policy="nearest"
    # makes any overflow drop the FARTHEST triangles; 32x128 tiles keep
    # the per-tile demand half of what the 64x128 default would see.
    r = Renderer(
        surface,
        RendererConfig(max_tris_per_tile=8192,
                       shadow_max_tris_per_tile=8192,
                       binning_policy="nearest",
                       tile_h=32, tile_w=128),
    )
    t0 = time.perf_counter()
    r.set_mesh(mesh)
    r.set_material(Material(color=(0.7, 0.6, 0.5, 1.0), roughness=0.35))
    cam = Camera.new([0, 0.4, 2.9], [0, 0, 0], 1920 / 1080)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    out.image.block_until_ready()
    print(f"upload + first frame: {time.perf_counter()-t0:.1f}s")

    # Drop-free escalation (round 5): feed the measured overflow back and
    # the capacities grow to the worst tile's exact demand — the next
    # frames render EVERY triangle (bench.py measures 32768/32768 caps
    # and 0/0 overflow for this scene; the 8192-cap render measures
    # 37 dB PSNR against the drop-free one).
    main_of = int(out.binning_overflow)
    shadow_of0 = (
        int(out.shadow_overflow) if out.shadow_overflow is not None else 0
    )
    if main_of or shadow_of0:
        changed = r.escalate_tile_capacities(main_of, shadow_of0)
        print(f"escalating tile caps to fit: {changed}")
        t0 = time.perf_counter()
        out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                             cam.position)
        out.image.block_until_ready()
        print(f"escalated first frame (compile): "
              f"{time.perf_counter()-t0:.1f}s")

    frames = 10
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                             cam.position)
    out.image.block_until_ready()
    dt = (time.perf_counter() - t0) / frames
    shadow_of = (
        int(out.shadow_overflow) if out.shadow_overflow is not None else 0
    )
    print(f"steady state: {dt*1000:.2f} ms/frame ({1/dt:.1f} fps) @ 1080p, "
          f"{mesh.num_triangles} triangles, covered "
          f"{int(out.covered_pixels)} px, "
          f"overflow main={int(out.binning_overflow)} shadow={shadow_of}")
    print("OK — 1M triangles within HBM")


if __name__ == "__main__":
    main()
