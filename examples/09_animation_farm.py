"""Example 09: frame-parallel offline rendering (an animation "farm").

The second parallelism axis next to example 05's screen-space bands
(ash_tpu/parallel/frame_parallel.py): every device renders a DIFFERENT
frame of a camera orbit — scene buffers replicate once, per-frame uniforms
shard along the mesh, zero cross-device communication. The right axis for
offline/animation throughput; use band mode (05) for single-frame latency.
TAA works here too (round 4): the farm pipelines history chip-to-chip
over a ppermute ring — the n renders stay parallel, only the cheap
resolve chain serializes — and history carries BETWEEN batches through
`history0`, so the whole sequence is temporally continuous.

On a CPU host, force virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/09_animation_farm.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(out_prefix="anim"):
    import os

    # The ambient environment may pin a single-chip platform via
    # sitecustomize; for a multi-frame demo prefer N virtual CPU devices
    # when only one device would be visible (must run before jax init).
    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax
    from jax.sharding import Mesh

    import __graft_entry__ as ge
    from ash_tpu.core.transform import Camera
    from ash_tpu.parallel import batch_uniforms, make_frame_parallel
    from ash_tpu.render.frame import FrameConfig
    from ash_tpu.utils.image import write_png

    n = len(jax.devices())
    mesh = Mesh(jax.devices(), ("fp",))
    print(f"rendering {n} frames at a time across {n} device(s)")

    config = FrameConfig(
        width=256, height=192, tile_h=16, tile_w=128, max_tris_per_tile=64,
        shadow_resolution=256, shadow_tile=64, shadow_max_tris_per_tile=64,
        post_enabled=True, bloom_mips=3, reinhard=False, taa_enabled=True,
    )
    scene, uni0 = ge._example_scene(n_cubes=12)

    def orbit_uniforms(frame_idx, total):
        th = 2 * np.pi * frame_idx / total
        pos = np.array(
            [8 * np.cos(th), 4.0, 8 * np.sin(th) + 1e-4], np.float32
        )
        cam = Camera.new(pos, [0, 0, 0], config.width / config.height)
        view, proj = cam.view_matrix(), cam.projection_matrix()
        return uni0._replace(
            view_proj=(proj @ view).astype(np.float32),
            camera_pos=pos,
            view=view.astype(np.float32),
            projection=proj.astype(np.float32),
        )

    from ash_tpu.ops.taa import TaaParams

    def taa_for(frame_idx):
        return TaaParams(
            blend_factor=np.float32(0.0 if frame_idx == 0 else 0.9),
            color_clamp=np.float32(1.0),
            velocity_rejection=np.float32(0.0),
            jitter=np.zeros(2, np.float32),
            prev_jitter=np.zeros(2, np.float32),
        )

    frames_fn = make_frame_parallel(config, mesh)
    total = 2 * n  # two batches of n frames
    t0 = time.perf_counter()
    images = []
    history = None  # carries between batches: chip 0 of batch b+1
    # consumes the last chip of batch b's resolved frame
    prev_u = orbit_uniforms(0, total)
    for batch_start in range(0, total, n):
        unis = []
        for i in range(n):
            u = orbit_uniforms(batch_start + i, total)
            # velocity: previous frame's camera (frame-to-frame motion)
            unis.append(u._replace(prev_view_proj=prev_u.view_proj,
                                   prev_models=u.models))
            prev_u = u
        taa_batch = batch_uniforms(
            [taa_for(batch_start + i) for i in range(n)]
        )
        out = frames_fn(scene, batch_uniforms(unis),
                        taa_batch=taa_batch, history0=history)
        images.append(np.asarray(out.image))  # (n, H, W, 4)
        history = out.history[n - 1]
    dt = time.perf_counter() - t0
    print(f"{total} frames in {dt:.2f}s "
          f"({total / dt:.1f} frames/s aggregate, batches of {n})")

    for i, img in enumerate(np.concatenate(images, axis=0)):
        write_png(f"{out_prefix}_{i:03d}.png", img)
    print(f"wrote {out_prefix}_000.png .. {out_prefix}_{total - 1:03d}.png")


if __name__ == "__main__":
    main(*sys.argv[1:2])
