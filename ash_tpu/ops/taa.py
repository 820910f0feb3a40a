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

TPU layout note: the resolve runs PLANAR internally — per-channel (H, W)
arrays — because any reduce/broadcast/stack along a minor channel axis of
an (H, W, 3) image costs ~6 ms per op at 1080p on this hardware (the
channel dim lands on the 128-wide lane axis, wasting 125 lanes; see
ops/bloom.py). The neighborhood taps are exact integer offsets -> static
shifts, not gathers; only the history reprojection (dynamic velocity
indices) gathers, via the flat-indexed channels-first form.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .bloom import bilinear_clamp, shift_clamp  # noqa: F401  (public compat)
from .bloom import _bilinear_clamp_cf
from .layout import to_cf, to_cl


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


def _rgb_to_ycocg_p(r, g, b):
    return (0.25 * r + 0.5 * g + 0.25 * b, 0.5 * r - 0.5 * b,
            -0.25 * r + 0.5 * g - 0.25 * b)


def _ycocg_to_rgb_p(y, co, cg):
    return (y + co - cg, y + cg, y - co - cg)


def _shift_cf(img: jnp.ndarray, oy: int, ox: int) -> jnp.ndarray:
    """(C, H, W) shifted by (oy, ox) with CLAMP_TO_EDGE — static slices."""
    h, w = img.shape[1:]
    pt, pb = max(-oy, 0), max(oy, 0)
    pl, pr = max(-ox, 0), max(ox, 0)
    p = jnp.pad(img, ((0, 0), (pt, pb), (pl, pr)), mode="edge")
    return p[:, pb:pb + h, pr:pr + w]


def taa_resolve(
    current: jnp.ndarray,  # (H, W, 3) current frame (HDR, pre-tonemap)
    history: jnp.ndarray,  # (H, W, 3) previous resolved frame
    params: TaaParams,
    velocity: Optional[jnp.ndarray] = None,  # (H, W, 2) uv motion or None
) -> jnp.ndarray:
    h, w = current.shape[:2]
    screen = jnp.asarray([w, h], jnp.float32)

    cur = to_cf(current)  # (3, H, W)
    hist_img = to_cf(history)

    u = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    v = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h

    jitter_vel = (params.jitter - params.prev_jitter) / screen
    if velocity is None:
        vel_u = jnp.broadcast_to(jitter_vel[0], (h, w))
        vel_v = jnp.broadcast_to(jitter_vel[1], (h, w))
    else:
        vx, vy = velocity[..., 0], velocity[..., 1]
        small = jnp.sqrt(vx * vx + vy * vy) < 1e-4
        vel_u = jnp.where(small, jitter_vel[0], vx)
        vel_v = jnp.where(small, jitter_vel[1], vy)

    hist_u_raw = u - vel_u
    hist_v_raw = v - vel_v
    hist_u = jnp.clip(hist_u_raw, 0.0, 1.0)
    hist_v = jnp.clip(hist_v_raw, 0.0, 1.0)
    hist = _bilinear_clamp_cf(hist_img, hist_u, hist_v)  # (3, H, W)

    # Neighborhood clamp in tonemapped YCoCg (comp:110-141) — static
    # integer shifts, planar YCoCg.
    def clamped_history():
        mins = None
        maxs = None
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                s = _shift_cf(cur, oy, ox)
                y, co, cg = _rgb_to_ycocg_p(
                    _tm(s[0]), _tm(s[1]), _tm(s[2])
                )
                c = (y, co, cg)
                if mins is None:
                    mins = list(c)
                    maxs = list(c)
                else:
                    mins = [jnp.minimum(a, x) for a, x in zip(mins, c)]
                    maxs = [jnp.maximum(a, x) for a, x in zip(maxs, c)]
        center = [(mn + mx) * 0.5 for mn, mx in zip(mins, maxs)]
        extent = [(mx - mn) * 0.5 for mn, mx in zip(mins, maxs)]
        mins = [c - e * 1.25 for c, e in zip(center, extent)]
        maxs = [c + e * 1.25 for c, e in zip(center, extent)]
        hy, hco, hcg = _rgb_to_ycocg_p(
            _tm(hist[0]), _tm(hist[1]), _tm(hist[2])
        )
        # clip_aabb, planar (comp:64-77).
        ctr = [(mx + mn) * 0.5 for mn, mx in zip(mins, maxs)]
        half = [(mx - mn) * 0.5 + 1e-3 for mn, mx in zip(mins, maxs)]
        delta = [hc - c for hc, c in zip((hy, hco, hcg), ctr)]
        ratios = [jnp.abs(d) / hf for d, hf in zip(delta, half)]
        max_v = jnp.maximum(ratios[0], jnp.maximum(ratios[1], ratios[2]))
        clipped = [
            jnp.where(max_v > 1.0, c + d / max_v, hc)
            for hc, c, d in zip((hy, hco, hcg), ctr, delta)
        ]
        ry, rco, rcg = clipped
        rr, rg, rb = _ycocg_to_rgb_p(ry, rco, rcg)
        return jnp.stack([_untm(rr), _untm(rg), _untm(rb)])

    use_clamp = params.color_clamp > 0.5
    hist_final = jnp.where(use_clamp, clamped_history(), hist)

    blend = params.blend_factor
    vel_len = jnp.sqrt(
        (vel_u * w) ** 2 + (vel_v * h) ** 2
    )
    vel_weight = jnp.clip(1.0 - vel_len * 0.1, 0.0, 1.0)
    blend = jnp.where(
        params.velocity_rejection > 0.5, blend * vel_weight, blend
    )

    onscreen = (
        (hist_u_raw >= 0.0) & (hist_u_raw <= 1.0)
        & (hist_v_raw >= 0.0) & (hist_v_raw <= 1.0)
    )
    blend = jnp.where(onscreen, blend, 0.0)

    out = cur * (1.0 - blend)[None] + hist_final * blend[None]
    return to_cl(out)
