"""Edge-adaptive MSAA resolve — the hardware-MSAA cost profile on TPU.

The reference's MSAA (src/renderer/msaa_targets.rs:24-120, renderpass.rs:
67-120) rasterizes at sample rate but SHADES once per pixel per covered
triangle, paying multisample cost only at geometry edges before a hardware
resolve. Plain SSAA (this renderer's default MSAA implementation) shades
every sample everywhere — an honest sample count but a true Nx shading
cost.

This module reproduces the hardware cost profile with dense TPU dataflow:

1. Rasterize the visibility buffer at sample rate (unchanged — hardware
   MSAA also rasterizes every sample).
2. Classify each presentation pixel: `uniform` when all its samples see
   the same triangle (or all background). ~95% of a typical frame.
3. Uniform pixels shade ONCE at the pixel center (the hardware shading
   rate; attribute derivatives step one presentation pixel so mip
   selection matches the 1x footprint).
4. Edge pixels stream-compact (compute_utils.prefix_sum_compact — the
   TPU form of the atomicAdd worklist) into a fixed-capacity list whose
   samples shade at full supersample rate and box-resolve back: edge
   pixels get the full SSAA result, which is strictly better than the
   hardware resolve's one-shade-per-triangle blend.

Shading cost ≈ 1x + N * edge_fraction instead of Nx. Capacity overflow is
graceful: pixels past the worklist keep their center shading (the count
is reported so the cap is never silent). The compacted worklist reshapes
to (cap*S/128, 128) so the shading math runs on full 128-lane tiles — a
(cap, S) layout would waste 128/S of every vector op.

Sample layout convention (matches render_band's SSAA reshape): render row
r = y*sy + dy, render col c = x*sx + dx for presentation pixel (y, x).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .compute_utils import exclusive_prefix_sum


def edge_capacity(n_pixels: int, fraction: float, samples: int) -> int:
    """Static worklist capacity: `fraction` of the band's pixels, rounded
    up so capacity * samples is a multiple of 128 (full-lane reshape)."""
    import math

    cap = max(int(n_pixels * fraction), 1)
    # cap*samples % 128 == 0 requires cap % (128/gcd(samples,128)) == 0 —
    # NOT cap % (128//samples): for sample counts that don't divide 128
    # (e.g. ssaa 3x1), floor(128/s) rounding breaks the lane-aligned
    # reshape contract asserted in build_worklist.
    s = max(samples, 1)
    unit = 128 // math.gcd(s, 128)
    cap = -(-cap // unit) * unit
    return min(cap, n_pixels + (-n_pixels) % unit)


class EdgePlan(NamedTuple):
    """Per-presentation-pixel classification of a sample-rate vis buffer."""

    primary_tid: jnp.ndarray  # (Hp, Wp) int32 — nearest sample's triangle
    uniform: jnp.ndarray  # (Hp, Wp) bool — all samples see primary_tid
    tid_samples: jnp.ndarray  # (Hp, Wp, S) int32 — per-pixel sample view


def classify(tri_id: jnp.ndarray, depth: jnp.ndarray, sy: int, sx: int) -> EdgePlan:
    """Group the (Hp*sy, Wp*sx) sample buffers by presentation pixel and
    pick each pixel's primary triangle (the depth-nearest sample, so
    partial-coverage pixels fall back to their covered surface — the
    centroid-sampling analog for worklist overflow)."""
    hr, wr = tri_id.shape
    hp, wp = hr // sy, wr // sx
    s = sy * sx
    tid_s = tri_id.reshape(hp, sy, wp, sx).transpose(0, 2, 1, 3).reshape(hp, wp, s)
    dep_s = depth.reshape(hp, sy, wp, sx).transpose(0, 2, 1, 3).reshape(hp, wp, s)
    near = jnp.argmin(dep_s, axis=-1)
    primary = jnp.take_along_axis(tid_s, near[..., None], axis=-1)[..., 0]
    uniform = jnp.all(tid_s == primary[..., None], axis=-1)
    return EdgePlan(primary_tid=primary, uniform=uniform, tid_samples=tid_s)


def center_pixel_xy(hp: int, wp: int, sy: int, sx: int, y0r) -> tuple:
    """Presentation-pixel CENTERS in global render-resolution coordinates
    (the coordinate frame triangle_setup's edge equations live in): pixel
    (y, x) spans render cols [x*sx, (x+1)*sx), so its center sits at
    (x + 0.5) * sx — NOT the (col + 0.5) sample convention."""
    xi = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    px = (xi.astype(jnp.float32) + 0.5) * sx
    py = (yi.astype(jnp.float32) + 0.5) * sy + y0r
    return px, py


def center_tile_xy(hp: int, wp: int, sy: int, sx: int) -> tuple:
    """Band-LOCAL integer render coords of pixel centers, for the Forward+
    tile lookup (shade_pbr pixel_xy): the light-culling tile grid is built
    at render resolution."""
    xi = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    return xi * sx + sx // 2, yi * sy + sy // 2


class EdgeWorklist(NamedTuple):
    """Fixed-capacity compacted edge-pixel worklist, sample-flattened to
    full 128-lane rows."""

    pixel_idx: jnp.ndarray  # (cap,) int32 band-local flat pixel id, -1 pad
    tid: jnp.ndarray  # (cap*S/128, 128) int32 per-sample triangle ids
    px: jnp.ndarray  # (cap*S/128, 128) f32 global render-coord x
    py: jnp.ndarray  # (cap*S/128, 128) f32 global render-coord y
    tile_px: jnp.ndarray  # (cap*S/128, 128) int32 band-local render x
    tile_py: jnp.ndarray  # (cap*S/128, 128) int32 band-local render y
    n_edge: jnp.ndarray  # () int32 TRUE edge-pixel count (can exceed cap)


def build_worklist(
    tri_id: jnp.ndarray,  # (Hr, Wr) sample-rate vis buffer
    plan: EdgePlan,
    capacity: int,
    sy: int,
    sx: int,
    y0r=0,
) -> EdgeWorklist:
    hr, wr = tri_id.shape
    hp, wp = hr // sy, wr // sx
    s = sy * sx
    assert capacity * s % 128 == 0, "capacity*samples must be lane-aligned"

    mask = (~plan.uniform).reshape(-1)
    n = mask.shape[0]
    # prefix_sum_compact, inlined to also return the TRUE count (the
    # public helper clamps it to capacity).
    slots = exclusive_prefix_sum(mask.astype(jnp.int32))
    n_edge = jnp.sum(mask.astype(jnp.int32))
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    out = jnp.full((capacity + 1,), -1, jnp.int32)
    write_to = jnp.where(mask & (slots < capacity), slots, capacity)
    pixel_idx = out.at[write_to].set(ids)[:capacity]

    safe = jnp.maximum(pixel_idx, 0)
    ey = safe // wp  # (cap,) band-local presentation row
    ex = safe % wp
    dy = jnp.arange(s, dtype=jnp.int32) // sx  # (S,) sample offsets
    dx = jnp.arange(s, dtype=jnp.int32) % sx
    ry = ey[:, None] * sy + dy[None, :]  # (cap, S) band-local render rows
    rx = ex[:, None] * sx + dx[None, :]
    flat = (ry * wr + rx).reshape(-1, 128)
    tid = tri_id.reshape(-1)[flat]
    px = rx.astype(jnp.float32).reshape(-1, 128) + 0.5
    py = ry.astype(jnp.float32).reshape(-1, 128) + 0.5 + y0r
    return EdgeWorklist(
        pixel_idx=pixel_idx,
        tid=tid,
        px=px,
        py=py,
        tile_px=rx.reshape(-1, 128),
        tile_py=ry.reshape(-1, 128),
        n_edge=n_edge,
    )


def resolve(
    color_center: jnp.ndarray,  # (Hp, Wp, 3) center-shaded frame
    edge_colors: jnp.ndarray,  # (cap*S/128, 128, 3) shaded worklist samples
    wl: EdgeWorklist,
    samples: int,
) -> jnp.ndarray:
    """Box-average each edge pixel's shaded samples and scatter them over
    the center-shaded frame. Padded / overflowed slots scatter into a dump
    row past the end, so capacity overflow degrades to center shading."""
    hp, wp, _ = color_center.shape
    cap = wl.pixel_idx.shape[0]
    mean = edge_colors.reshape(cap, samples, 3).mean(axis=1)
    flat = color_center.reshape(hp * wp, 3)
    tgt = jnp.where(wl.pixel_idx >= 0, wl.pixel_idx, hp * wp)
    out = jnp.concatenate([flat, jnp.zeros((1, 3), flat.dtype)], axis=0)
    out = out.at[tgt].set(mean)
    return out[: hp * wp].reshape(hp, wp, 3)
