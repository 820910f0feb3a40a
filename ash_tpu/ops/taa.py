"""TAA resolve — numerical port of shaders/taa_resolve.comp.

Blends the current frame with reprojected history using:
- YCoCg-space 3x3 neighborhood AABB, expanded 1.25x (taa_resolve.comp:113-135)
- clip-to-AABB history clamping (comp:64-77)
- Reinhard tonemap/untonemap around the clamp (comp:55-61)
- velocity (or jitter-difference) reprojection (comp:94-102)
- velocity-based blend rejection (comp:144-150)
- off-screen history -> blend 0 (comp:153-156)

The compute-shader's image race fix (memoryBarrierImage, comp:164-166) is
unnecessary here: the resolve is a pure function; history is explicit carried
state (fb, history_in) -> (resolved, history_out = resolved).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .bloom import bilinear_clamp


class TaaParams(NamedTuple):
    blend_factor: jnp.ndarray  # () f32, default 0.9
    color_clamp: jnp.ndarray  # () f32 bool-ish
    velocity_rejection: jnp.ndarray  # () f32 bool-ish
    jitter: jnp.ndarray  # (2,) current-frame subpixel jitter (pixels)
    prev_jitter: jnp.ndarray  # (2,)


def rgb_to_ycocg(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack(
        [0.25 * r + 0.5 * g + 0.25 * b, 0.5 * r - 0.5 * b,
         -0.25 * r + 0.5 * g - 0.25 * b],
        axis=-1,
    )


def ycocg_to_rgb(c: jnp.ndarray) -> jnp.ndarray:
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)


def _tm(c):
    return c / (1.0 + c)


def _untm(c):
    return c / (1.0 - c + 1e-4)


def clip_aabb(aabb_min, aabb_max, history):
    """Clip history toward the AABB center (taa_resolve.comp:64-77)."""
    center = 0.5 * (aabb_max + aabb_min)
    half = 0.5 * (aabb_max - aabb_min) + 1e-3
    delta = history - center
    v = delta / half
    max_v = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    return jnp.where(max_v > 1.0, center + delta / max_v, history)


def taa_resolve(
    current: jnp.ndarray,  # (H, W, 3) current frame (HDR, pre-tonemap)
    history: jnp.ndarray,  # (H, W, 3) previous resolved frame
    params: TaaParams,
    velocity: Optional[jnp.ndarray] = None,  # (H, W, 2) uv motion or None
) -> jnp.ndarray:
    h, w = current.shape[:2]
    screen = jnp.asarray([w, h], jnp.float32)

    u = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    v = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h

    if velocity is None:
        vel = jnp.broadcast_to(
            (params.jitter - params.prev_jitter) / screen, (h, w, 2)
        )
    else:
        small = jnp.linalg.norm(velocity, axis=-1, keepdims=True) < 1e-4
        vel = jnp.where(
            small, (params.jitter - params.prev_jitter) / screen, velocity
        )

    hist_u_raw = u - vel[..., 0]
    hist_v_raw = v - vel[..., 1]
    hist_u = jnp.clip(hist_u_raw, 0.0, 1.0)
    hist_v = jnp.clip(hist_v_raw, 0.0, 1.0)
    hist = bilinear_clamp(history, hist_u, hist_v)

    # Neighborhood clamp in tonemapped YCoCg (comp:110-141).
    def clamped_history():
        mins = None
        maxs = None
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                s = bilinear_clamp(current, u + ox / w, v + oy / h)
                c = rgb_to_ycocg(_tm(s))
                mins = c if mins is None else jnp.minimum(mins, c)
                maxs = c if maxs is None else jnp.maximum(maxs, c)
        center = (mins + maxs) * 0.5
        extent = (maxs - mins) * 0.5
        mins = center - extent * 1.25
        maxs = center + extent * 1.25
        hist_y = rgb_to_ycocg(_tm(hist))
        return _untm(ycocg_to_rgb(clip_aabb(mins, maxs, hist_y)))

    use_clamp = params.color_clamp > 0.5
    hist_final = jnp.where(use_clamp, clamped_history(), hist)

    blend = params.blend_factor
    vel_len = jnp.linalg.norm(vel * screen, axis=-1)
    vel_weight = jnp.clip(1.0 - vel_len * 0.1, 0.0, 1.0)
    blend = jnp.where(
        params.velocity_rejection > 0.5, blend * vel_weight, blend
    )

    onscreen = (
        (hist_u_raw >= 0.0) & (hist_u_raw <= 1.0)
        & (hist_v_raw >= 0.0) & (hist_v_raw <= 1.0)
    )
    blend = jnp.where(onscreen, blend, 0.0)

    return current * (1.0 - blend[..., None]) + hist_final * blend[..., None]
