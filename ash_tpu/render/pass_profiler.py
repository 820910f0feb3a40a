"""Per-pass device timing — the GpuProfiler's named-scope readout.

The fused frame program cannot be timed per-pass from outside (XLA schedules
it as one executable), so this profiler mirrors the reference's *query-pool
instrumentation* (gpu_profiler.rs:25-64) by running each stage as its own
jitted program with a fence, on demand. Use sparingly (it serializes the
pipeline, exactly like dense GPU timestamp queries); results cache into
DeviceProfiler/GpuTimings for the overlay and console.

Scope names follow the reference: FrameStart..ShadowEnd..SceneEnd..
PostProcessEnd (gpu_profiler.rs named scopes).

Caveat: each scope pays one dispatch round-trip; on a remotely-tunneled chip
that fixed overhead (~5 ms) can exceed the pass itself, so treat numbers as
upper bounds there (the fused frame is the ground truth for totals). On
directly-attached hardware the overhead is tens of microseconds.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp


def _time(fn, *args, n=3) -> tuple:
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0, out


def profile_passes(renderer, view, proj, camera_pos, n: int = 3) -> Dict[str, float]:
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
        lambda: geometry.transform_vertices(
            models, view_proj, scene.position, scene.normal, scene.tangent,
            scene.vert_draw, vert_uid=scene.vert_uid,
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
        world4 = jnp.concatenate([tv.world, jnp.ones_like(tv.world[:, :1])], -1)
        clip_l = jnp.einsum("ij,vj->vi", lsm, world4)

        def shadow_pass():
            setup_s = geometry.triangle_setup(
                clip_l, scene.tri_v, scene.tri_valid, s, s, "front"
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
        lambda: geometry.triangle_setup(
            tv.clip, scene.tri_v, scene.tri_valid, w, h, "back"
        ), n=n,
    )
    timings["Setup"] = t
    t, bins = _time(
        lambda: binner(
            setup.bbox, setup.valid, h, w, cfg.tile_h, cfg.tile_w,
            cfg.max_tris_per_tile,
        ), n=n,
    )
    timings["Binning"] = t
    t, vis = _time(
        lambda: rast(setup, bins, h, w, cfg.tile_h, cfg.tile_w), n=n
    )
    timings["Raster"] = t
    t, gbuf = _time(
        lambda: interpolate_gbuffer(
            vis.tri_id, setup, scene.tri_v, scene.tri_draw, tv, scene.uv,
            scene.color, vert_uid=scene.vert_uid,
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
        lambda: shade_pbr(gbuf, scene.materials, su, shadow_map, None), n=n
    )
    timings["SceneEnd"] = t

    renderer.device_profiler._samples = dict(timings)
    renderer.diagnostics_state.gpu_timings.passes = dict(timings)
    return timings
