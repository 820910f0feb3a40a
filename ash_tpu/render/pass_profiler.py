"""Per-pass device timing — the GpuProfiler's named-scope readout.

The fused frame program cannot be timed per-pass from outside (XLA schedules
it as one executable), so this profiler mirrors the reference's *query-pool
instrumentation* (gpu_profiler.rs:25-64) by running each stage as its own
jitted program with a fence, on demand. Use sparingly (it serializes the
pipeline, exactly like dense GPU timestamp queries); results cache into
DeviceProfiler/GpuTimings for the overlay and console.

Scope names follow the reference: FrameStart..ShadowEnd..SceneEnd..
PostProcessEnd (gpu_profiler.rs named scopes).

Dispatch overhead is amortized: each stage runs `n` times inside ONE jitted
lax.fori_loop, with a tiny output-derived scalar threaded between
iterations so XLA cannot overlap or hoist them. The single dispatch
round-trip (the ~5-10 ms tunnel floor on a remote chip) is thus divided by
`n` (default 64), giving stable numbers even through the tunnel — the
software analog of writing both timestamps of a query-pool scope inside
the same submission.

Caveat (measured): the fori_loop harness pessimizes absolute numbers by a
roughly constant factor (~3-4x at 1080p — no cross-stage fusion, loop
barriers, layout constraints; even the FULL frame program measures ~7.6 ms
per in-loop iteration vs ~2 ms fused). Treat the values as RELATIVE
weights/upper bounds; bench.py prints them normalized to the fused frame
time, which is the ground truth for totals.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp


def _time(fn, n=64) -> tuple:
    """Time `fn(eps)` (eps: f32 scalar mixed into the stage input) over n
    sequential in-graph iterations; returns (ms_per_iteration, output)."""

    def run(eps):
        def body(_, carry):
            out = fn(carry)
            leaf = jax.tree.leaves(out)[0]
            # Output -> next-input dependency XLA cannot simplify away;
            # value is 0.0 (or subnormal) so the stage's numerics are
            # untouched.
            return jnp.minimum(
                jnp.float32(0.0),
                leaf.ravel()[0].astype(jnp.float32) * jnp.float32(1e-38),
            )
        # The final fn() call (whose output the caller keeps) takes the
        # loop's carry, so all n+1 evaluations are provably sequential.
        eps2 = jax.lax.fori_loop(0, n, body, eps)
        return eps2, fn(eps2)

    f = jax.jit(run)
    zero = jnp.float32(0.0)
    out = f(zero)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(f(zero)[0])
    total = time.perf_counter() - t0
    # The trailing fn(eps) runs once more to produce `out`; count it.
    return total / (n + 1) * 1000.0, out[1]


def profile_passes(renderer, view, proj, camera_pos, n: int = 64) -> Dict[str, float]:
    """Measure each frame stage on the device; returns ms per scope and
    stores them on the renderer's DeviceProfiler."""
    import numpy as np

    from ..ops import binning, geometry, raster
    from ..ops.raster_pallas import rasterize_pallas
    from ..ops.shade import ShadeUniforms, interpolate_gbuffer, shade_pbr
    from .frame import FrameUniforms
    from .renderer import FRAME_AMBIENT, FRAME_LIGHT_COLOR, FRAME_LIGHT_DIR
    from .scene import build_models, build_scene

    items = renderer._current_draw_items()
    if renderer._scene is None or renderer._scene_dirty:
        renderer._scene = build_scene(items, renderer.mesh_registry)
        renderer._scene_dirty = False
    scene = renderer._scene.buffers
    cfg = renderer._frame_config(textured=False)
    view = np.asarray(view, np.float32)
    proj = np.asarray(proj, np.float32)
    models = jnp.asarray(build_models(items, scene.materials.shape[0]))
    view_proj = jnp.asarray(proj @ view)
    rast = rasterize_pallas if cfg.use_pallas else raster.rasterize

    timings: Dict[str, float] = {}

    t, tv = _time(
        lambda eps: geometry.transform_vertices(
            models + eps, view_proj, scene.position, scene.normal,
            scene.tangent, scene.vert_draw, vert_uid=scene.vert_uid,
        ), n=n,
    )
    timings["Vertex"] = t

    from .frame import _binner

    binner = _binner(cfg, scene.tri_v.shape[0])

    shadow_map = None
    if cfg.shadow_enabled:
        s = cfg.shadow_resolution
        st_h = (
            cfg.shadow_tile_h
            if cfg.shadow_tile_h is not None
            else min(cfg.shadow_tile, 32)
        )
        lsm = jnp.asarray(renderer.shadow_feature.light_space_matrix())
        # Jitted (NOT eager): eager dispatch on the tunneled backend is both
        # slow and a risk to the process's pipelined-dispatch mode.
        clip_l = jax.jit(
            lambda w, m: jnp.einsum(
                "ij,vj->vi", m,
                jnp.concatenate([w, jnp.ones_like(w[:, :1])], -1),
            )
        )(tv.world, lsm)

        def shadow_pass(eps):
            setup_s = geometry.triangle_setup(
                clip_l + eps, scene.tri_v, scene.tri_valid, s, s, "front"
            )
            bins_s = binner(
                setup_s.bbox, setup_s.valid, s, s, st_h,
                cfg.shadow_tile, cfg.shadow_max_tris_per_tile,
            )
            return rast(setup_s, bins_s, s, s, st_h, cfg.shadow_tile)

        t, vis_s = _time(shadow_pass, n=n)
        timings["ShadowEnd"] = t
        shadow_map = vis_s.depth

    w, h = cfg.width, cfg.height
    t, setup = _time(
        lambda eps: geometry.triangle_setup(
            tv.clip + eps, scene.tri_v, scene.tri_valid, w, h, "back"
        ), n=n,
    )
    timings["Setup"] = t
    t, bins = _time(
        lambda eps: binner(
            setup.bbox + eps, setup.valid, h, w, cfg.tile_h, cfg.tile_w,
            cfg.max_tris_per_tile,
        ), n=n,
    )
    timings["Binning"] = t
    t, vis = _time(
        lambda eps: rast(
            setup._replace(edge=setup.edge + eps), bins, h, w,
            cfg.tile_h, cfg.tile_w,
        ), n=n,
    )
    timings["Raster"] = t
    t, gbuf = _time(
        lambda eps: interpolate_gbuffer(
            vis.tri_id, setup._replace(edge=setup.edge + eps), scene.tri_v,
            scene.tri_draw, tv, scene.uv, scene.color,
            vert_uid=scene.vert_uid,
        ), n=n,
    )
    timings["GBuffer"] = t
    ld = FRAME_LIGHT_DIR / np.linalg.norm(FRAME_LIGHT_DIR)
    su = ShadeUniforms(
        camera_pos=jnp.asarray(camera_pos, jnp.float32).reshape(3),
        light_direction=jnp.asarray(ld),
        light_color=jnp.asarray(FRAME_LIGHT_COLOR),
        ambient_color=jnp.asarray(FRAME_AMBIENT),
        light_space_matrix=jnp.asarray(
            renderer.shadow_feature.light_space_matrix()
        ),
    )
    t, _ = _time(
        lambda eps: shade_pbr(
            gbuf, scene.materials + eps, su, shadow_map, None
        ), n=n,
    )
    timings["SceneEnd"] = t

    renderer.device_profiler._samples = dict(timings)
    renderer.diagnostics_state.gpu_timings.passes = dict(timings)
    return timings
