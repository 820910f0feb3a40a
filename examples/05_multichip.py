"""Example 05: multi-chip SPMD rendering over a device mesh.

Shards the framebuffer across all available devices (screen-space bands, see
ash_tpu/parallel/sharded.py) and checks the result equals a single-chip
render. On a CPU host, force virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_multichip.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(out="multichip.png"):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ash_tpu.parallel import make_sharded_frame, render_mesh
    from ash_tpu.render.frame import FrameConfig, render_frame_program
    from ash_tpu.utils.image import write_png

    n = len(jax.devices())
    mesh = render_mesh(n)
    print(f"rendering across {n} device(s): {mesh}")

    config = FrameConfig(
        width=512, height=max(16 * n, 384),
        tile_h=16, tile_w=128, max_tris_per_tile=64,
        shadow_resolution=16 * n * max(1, 256 // (16 * n)),
        shadow_tile=16, shadow_max_tris_per_tile=64,
    )
    scene, uni = ge._example_scene(n_cubes=12)
    uni = jax.tree.map(jnp.asarray, uni)

    frame = make_sharded_frame(config, mesh)
    img = np.asarray(frame(scene, uni).image)

    single = render_frame_program(config, scene, uni, None)
    match = (img == np.asarray(single.image)).mean()
    print(f"sharded == single-chip: {match:.1%} of pixels identical")
    write_png(out, img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
