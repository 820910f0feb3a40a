"""In-graph device-throughput probe: the honest frames-per-second.

Round-5 discovery (probe chain in ROADMAP "Tunnel measurement model"):
on the tunneled TPU backend, `block_until_ready` ACKS WITHOUT WAITING —
a 141-TFLOP chained-matmul program "blocks" in 0.02 ms, and nine queued
copies of it ack instantly. Every wall-clock frame time measured by
dispatching single-frame executions (BENCH r1-r4's fps lines) therefore
measured the HOST'S DISPATCH RATE, not render throughput. Forcing the
queue to drain (any readback) exposes ~0.5 s per single-frame
EXECUTION — but that is per-execution tunnel service overhead (it falls
to ~28 ms for a one-argument program), not device time.

The measurement that survives all of this: put K frames inside ONE
executable (`lax.scan` whose body consumes the previous iteration's
output, so nothing hoists or folds), force completion with a tiny
readback, and take the SLOPE between two K values — per-execution
overhead, dispatch cost, transfer latency, and readback noise all
cancel in the difference. What remains is genuine per-frame device
time, upper-bounded by the scan harness's lost cross-iteration fusion
(measured ~7-8 ms/frame for the plain 1080p scene where single-frame
walls claimed 0.4-0.9 ms). On a directly attached TPU the same probe is
simply a clean throughput measurement.

The probe builds its scan from a live Renderer's last-frame state
(same config, same buffers, same external-shadow cache), so it times
the production pipeline, not a toy."""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def _measure_slope(make, k_lo: int, k_hi: int, reps: int):
    """Shared K-pair measurement protocol: for each K, build the scan via
    `make(k) -> (fn, args)`, compile + drain once, then take the best of
    `reps` drain-forced walls; the (k_hi - k_lo) slope is the per-frame
    device time. Returns (device_ms, covered) or None on a non-positive
    slope (scheduling-noise inversion on loaded hosts — callers retry)."""
    results = {}
    covered = None
    for k in (k_lo, k_hi):
        f, args = make(k)
        np.asarray(f(*args))  # compile + first drain
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            cov = np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        results[k] = best
        covered = int(cov[-1])
    slope_s = (results[k_hi] - results[k_lo]) / (k_hi - k_lo)
    if slope_s <= 0:
        return None
    return slope_s * 1000.0, covered


def _build_scan(r, k: int):
    """Jitted fn(consts, scene, models, pool, lights, ext, history0,
    prev_depth0) running the renderer's current frame program k times
    in-graph, returning per-iteration covered-pixel counts."""
    import jax
    import jax.numpy as jnp

    from ..frame import (
        finalize_frame,
        render_band,
        render_frame_program,
        unpack_frame_consts,
    )

    (config, _consts, _models, _prev_models, _pool, _lights,
     use_ext) = r._warm_args
    cfg = config

    def body_fn(c, dep, scene, models, prev_models, pool, lights, ext,
                history, prev_depth):
        # The previous iteration's covered count perturbs the consts by
        # a denormal-scale epsilon: a true data dependence (no hoisting,
        # no CSE across iterations) with no numeric effect.
        ci = c.at[0].add(dep)
        uni, post, taa = unpack_frame_consts(cfg, ci, models, prev_models)
        if cfg.post_enabled:
            bo = render_band(
                cfg, scene, uni, pool, lights, prev_depth, r._ibl,
                band=None, ext_shadow=ext,
            )
            out = finalize_frame(cfg, bo, post, taa, history)
        else:
            out = render_frame_program(
                cfg, scene, uni, pool, post, taa, history, lights,
                prev_depth, r._ibl, ext,
            )
        dep = out.covered_pixels.astype(jnp.float32) * jnp.float32(1e-30)
        history = out.history if out.history is not None else history
        if cfg.occlusion_culling:
            prev_depth = out.depth
        return dep, history, prev_depth, out.covered_pixels

    @jax.jit
    def f(consts, scene, models, prev_models, pool, lights, ext,
          history0, prev_depth0):
        def body(carry, _):
            dep, history, prev_depth = carry
            dep, history, prev_depth, cov = body_fn(
                consts, dep, scene, models, prev_models, pool, lights,
                ext, history, prev_depth,
            )
            return (dep, history, prev_depth), cov

        (_, _, _), cov = jax.lax.scan(
            body, (jnp.float32(0.0), history0, prev_depth0), None,
            length=k,
        )
        return cov

    return f


def ingraph_device_ms_dynamic(
    r,
    consts_list,
    k_lo: int = 4,
    k_hi: int = 24,
    reps: int = 2,
) -> Optional[dict]:
    """Animated-path variant: scan over per-frame packed dynamic consts.

    `consts_list` is a list of the one-upload dynamic buffers (consts +
    TRS or model-matrix tail) from real animated frames — the probe
    cycles them to K scan iterations, composing the models ON DEVICE per
    iteration exactly as compiled_frame_dynamic[_trs] does, shadows
    inline. Measures the true device cost of an animated frame (the
    wall-clock animated:static ratio only sees host+dispatch)."""
    import jax
    import jax.numpy as jnp

    from ..frame import (
        consts_layout,
        models_from_trs,
        render_frame_program,
        unpack_frame_consts,
    )

    if getattr(r, "_dyn_args", None) is None or r._scene is None:
        return None
    (config, _c, kind, pool, history, lights, prev_depth) = r._dyn_args
    cfg = config
    scene = r._scene.buffers
    _, total = consts_layout(cfg)
    d = scene.num_draws

    def make(k):
        batch = jnp.stack([
            jnp.asarray(consts_list[i % len(consts_list)])
            for i in range(k)
        ])

        @jax.jit
        def f(batch, scene, pool, lights, prev_depth, history):
            def body(dep, ci):
                ci = ci.at[0].add(dep)
                if kind == "trs":
                    t = ci[total:total + 3 * d].reshape(d, 3)
                    q = ci[total + 3 * d:total + 7 * d].reshape(d, 4)
                    s = ci[total + 7 * d:total + 10 * d].reshape(d, 3)
                    models = models_from_trs(t, q, s)
                else:
                    models = ci[total:total + 16 * d].reshape(d, 4, 4)
                uni, post, taa = unpack_frame_consts(
                    cfg, ci[:total], models, None
                )
                out = render_frame_program(
                    cfg, scene, uni, pool, post, taa, history, lights,
                    prev_depth, r._ibl, None,
                )
                dep = (out.covered_pixels.astype(jnp.float32)
                       * jnp.float32(1e-30))
                return dep, out.covered_pixels

            _, cov = jax.lax.scan(body, jnp.float32(0.0), batch)
            return cov

        return f, batch

    def make_with_args(k):
        f, batch = make(k)
        return f, (batch, scene, pool, lights, prev_depth, history)

    measured = _measure_slope(make_with_args, k_lo, k_hi, reps)
    if measured is None:
        return None
    device_ms, covered = measured
    return {
        "device_ms": device_ms,
        "fps": 1000.0 / device_ms,
        "k": (k_lo, k_hi),
        "covered": covered,
    }


def ingraph_device_ms(
    r,
    k_lo: int = 4,
    k_hi: int = 24,
    reps: int = 2,
) -> Optional[dict]:
    """Measure true per-frame device time of `r`'s current frame.

    Requires at least one rendered frame (the probe reuses the last
    frame's packed constants, scene buffers, and shadow cache). Returns
    {"device_ms", "fps", "k": (k_lo, k_hi), "covered"} or None when the
    renderer's state doesn't expose the standard pipeline (chunked or
    dynamic-only paths).
    """
    import jax.numpy as jnp

    if getattr(r, "_warm_args", None) is None or r._scene is None:
        return None
    (config, consts, models, prev_models, pool, lights,
     use_ext) = r._warm_args
    scene = r._scene.buffers
    ext = None
    if use_ext:
        if r._shadow_cache is None:
            return None
        ext = (r._shadow_cache[1], r._shadow_cache[2])
    history0 = (
        jnp.zeros((r._height, r._width, 3), jnp.float32)
        if config.taa_enabled and config.post_enabled else None
    )
    prev_depth0 = (
        jnp.ones((r._height, r._width), jnp.float32)
        if config.occlusion_culling else None
    )
    consts = jnp.asarray(consts)
    prev_models = None if prev_models is None else jnp.asarray(prev_models)

    def make_with_args(k):
        return _build_scan(r, k), (
            consts, scene, models, prev_models, pool, lights, ext,
            history0, prev_depth0,
        )

    measured = _measure_slope(make_with_args, k_lo, k_hi, reps)
    if measured is None:
        return None
    device_ms, covered = measured
    return {
        "device_ms": device_ms,
        "fps": 1000.0 / device_ms,
        "k": (k_lo, k_hi),
        "covered": covered,
    }
