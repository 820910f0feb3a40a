"""Example 13: dynamic scenes — the one-upload animated frame.

The reference animates by writing each draw's model matrix into push
constants every frame (src/renderer/model_renderer.rs:309-385) — on a
PCIe GPU that traffic is free. On a TPU the per-frame host->device
transfer IS the animated loop's cost, so ash_tpu gives dynamic scenes a
dedicated cost profile:

- `update_transforms(matrices)` marks the frame dirty; the next frame
  rides the matrices on the TAIL of the packed frame-constants buffer:
  ONE upload + ONE dispatch (shadows render inline — a moving scene
  invalidates the shadow cache every frame anyway).
- `update_transforms_trs(t, q, s)` uploads 10 floats/draw instead of 16
  and composes the matrices ON DEVICE (render/frame.models_from_trs),
  bit-identical to the host compose (core/maths.mat4_trs_batch).

This demo spins a grid of cubes with per-object phases and writes a few
PNG frames. Run on anything:

    python examples/13_trs_animation.py [n_frames] [out_prefix]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_frames=8, out_prefix="trs"):
    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import (
        HeadlessSurface,
        RenderCommand,
        Renderer,
        RendererConfig,
    )
    from ash_tpu.utils.image import write_png

    w, h = 640, 360
    side = 6
    n = side * side
    r = Renderer(HeadlessSurface(w, h), RendererConfig())
    r.register_mesh_handle(0, Mesh.create_cube())

    rng = np.random.default_rng(5)
    positions = np.zeros((n, 3), np.float32)
    cmds = []
    for i in range(n):
        y, x = divmod(i, side)
        positions[i] = ((x - (side - 1) / 2) * 2.5, 0.0,
                        (y - (side - 1) / 2) * 2.5)
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = positions[i]
        r.register_material_handle(i + 1, Material(
            color=tuple(float(c) for c in 0.3 + 0.7 * rng.random(3)) + (1.0,),
            roughness=float(0.2 + 0.6 * rng.random()),
            metallic=float(rng.random()),
        ))
        cmds.append(RenderCommand(mesh=0, transform=m, material=i + 1))
    r.submit_render_commands(cmds)
    extent = side * 2.5
    r.shadow_feature.set_scene_bounds([0, 0, 0], extent)

    cam = Camera.new([extent, extent * 0.7, extent * 1.2],
                     [0, 0, 0], w / h)
    view, proj = cam.view_matrix(), cam.projection_matrix()

    phases = rng.random(n).astype(np.float32) * 6.2832
    scales = (0.6 + 0.5 * rng.random(n)).astype(np.float32)

    t0 = time.perf_counter()
    out = r.render_frame(view, proj, cam.position)
    out.image.block_until_ready()
    print(f"first frame (compile): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    for k in range(int(n_frames)):
        a = (phases + 0.15 * (k + 1)) * 0.5  # half-angles
        quat = np.zeros((n, 4), np.float32)  # spin about Y (xyzw)
        quat[:, 1] = np.sin(a)
        quat[:, 3] = np.cos(a)
        bob = positions.copy()
        bob[:, 1] = 0.6 * np.sin(phases + 0.3 * k)  # bounce
        t1 = time.perf_counter()
        r.update_transforms_trs(bob, quat, scales)
        out = r.render_frame(view, proj, cam.position)
        out.image.block_until_ready()
        ms = (time.perf_counter() - t1) * 1000.0
        path = f"{out_prefix}_{k:03d}.png"
        write_png(path, np.asarray(out.image))
        print(f"frame {k}: {ms:.2f} ms -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
