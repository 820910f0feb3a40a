"""Forward+ tiled light culling — port of shaders/light_culling.comp.

Per 16x16-pixel tile (TILE_SIZE, reference features/light_culling.rs:17-23):
1. min/max depth over the tile's pixels — the shader's uint-bitcast
   atomicMin/Max in shared memory (light_culling.comp:122-143) becomes a
   dense reshape + reduction;
2. tile frustum: 4 side planes through the view-space origin from the tile's
   corner rays (via the inverse projection, comp:71-98) plus the near/far
   planes built from the raw depth bounds — replicated with the reference's
   exact formulas, quirks included (it compares view-space z against NDC
   depth values);
3. every (tile, light) pair tested at once: sphere-vs-6-planes in view space
   (comp:167-191) — no thread striding, no atomics;
4. compaction to the reference's output layout `[count, idx...]` per tile
   (comp:194-202) via top-k, order-preserving.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE_SIZE = 16
MAX_LIGHTS_PER_TILE = 256


class TileLights(NamedTuple):
    mask: jnp.ndarray  # (ty, tx, L) bool — light affects tile
    indices: jnp.ndarray  # (ty, tx, K) int32 compacted, -1 padded
    counts: jnp.ndarray  # (ty, tx) int32


def tile_depth_bounds(depth: jnp.ndarray, tile: int = TILE_SIZE):
    """(min, max) depth per tile; padding rows/cols use (1.0, 0.0) identity
    like the shader's init values (comp:124-125)."""
    h, w = depth.shape
    ty, tx = -(-h // tile), -(-w // tile)
    dmin = jnp.pad(depth, ((0, ty * tile - h), (0, tx * tile - w)),
                   constant_values=1.0)
    dmax = jnp.pad(depth, ((0, ty * tile - h), (0, tx * tile - w)),
                   constant_values=0.0)
    dmin = dmin.reshape(ty, tile, tx, tile).min(axis=(1, 3))
    dmax = dmax.reshape(ty, tile, tx, tile).max(axis=(1, 3))
    return dmin, dmax


def _screen_to_view(inv_projection, ndc_xy, depth):
    """comp:64-68: unproject an NDC point at given depth to view space."""
    clip = jnp.concatenate(
        [ndc_xy, jnp.full_like(ndc_xy[..., :1], depth),
         jnp.ones_like(ndc_xy[..., :1])], axis=-1)
    v = jnp.einsum("ij,...j->...i", inv_projection, clip)
    return v[..., :3] / v[..., 3:4]


def tile_frustum_planes(
    inv_projection: jnp.ndarray,  # (4, 4)
    width: int,
    height: int,
    dmin: jnp.ndarray,  # (ty, tx)
    dmax: jnp.ndarray,  # (ty, tx)
    tile: int = TILE_SIZE,
    tile_y0=0,  # global tile-row offset of this band (may be traced)
) -> jnp.ndarray:
    """(ty, tx, 6, 4) view-space planes (comp:71-98).

    `width`/`height` are the FULL framebuffer dimensions (the NDC mapping);
    the (ty, tx) grid may cover only a band of tile rows starting at global
    tile row `tile_y0` (screen-space sharding)."""
    ty, tx = dmin.shape
    tix = jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 1)
    tiy = jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 0) + jnp.asarray(
        tile_y0, jnp.float32
    )
    min_ndc_x = (tix * tile) / width * 2.0 - 1.0
    min_ndc_y = (tiy * tile) / height * 2.0 - 1.0
    max_ndc_x = ((tix + 1) * tile) / width * 2.0 - 1.0
    max_ndc_y = ((tiy + 1) * tile) / height * 2.0 - 1.0

    def corner(x, y):
        # comp:79-82 passes (ndc*0.5+0.5) into screenToView, which remaps by
        # *2-1 again — i.e. corners are effectively unprojected at the raw
        # NDC coords. Replicated faithfully.
        xy = jnp.stack([x * 0.5 + 0.5, y * 0.5 + 0.5], axis=-1)
        xy = xy * 2.0 - 1.0
        return _screen_to_view(inv_projection, xy, 0.0)

    c0 = corner(min_ndc_x, min_ndc_y)
    c1 = corner(max_ndc_x, min_ndc_y)
    c2 = corner(max_ndc_x, max_ndc_y)
    c3 = corner(min_ndc_x, max_ndc_y)
    # Interior reference ray (the tile center direction): side planes pass
    # through the origin, so sign(n . interior) orients each normal INWARD
    # regardless of the projection's handedness/Y-flip.
    interior = (c0 + c1 + c2 + c3) * 0.25

    def plane(a, b):
        # Deviation from the reference (light_culling.comp:87-97): its
        # cross(corner, corner) winding points every side-plane normal
        # OUTWARD, so `dist >= -r` actually tests "within r of the plane
        # from outside" — it falsely culls lights that reach pixels near
        # tile borders and (at distance > r/sin(halfangle)) even lights
        # inside the tile. Latent in the reference (the pass was never
        # wired into its frame); caught here by the brute-force fuzz
        # (tests/test_compute_fuzz.py) once the lists were consumed.
        v = jnp.cross(a, b)
        ln = jnp.linalg.norm(v, axis=-1, keepdims=True)
        n = jnp.where(ln > 1e-4, v / jnp.maximum(ln, 1e-8), 0.0)
        s = jnp.sign(jnp.sum(n * interior, axis=-1, keepdims=True))
        n = n * jnp.where(s == 0.0, 1.0, s)
        return jnp.concatenate([n, jnp.zeros_like(n[..., :1])], axis=-1)

    left = plane(c3, c0)
    right = plane(c1, c2)
    bottom = plane(c0, c1)
    top = plane(c2, c3)

    # Near/far planes from the tile's depth bounds. The reference plugs the
    # RAW [0,1] depth values into view-space plane offsets
    # (light_culling.comp:96-97) — a latent bug (that pass was never wired
    # into the frame, SURVEY §3.2). Since we actually consume these lists,
    # the bounds are unprojected to view-space distances first; the plane
    # structure (0,0,-1,-minD) / (0,0,1,maxD) is otherwise identical.
    def view_dist(d):
        zero = jnp.zeros_like(d)
        clip = jnp.stack([zero, zero, d, jnp.ones_like(d)], axis=-1)
        vv = jnp.einsum("ij,...j->...i", inv_projection, clip)
        return -(vv[..., 2] / vv[..., 3])  # positive view-space distance

    min_d = view_dist(dmin)
    max_d = view_dist(dmax)
    zeros = jnp.zeros_like(dmin)
    near = jnp.stack([zeros, zeros, zeros - 1.0, -min_d], axis=-1)
    far = jnp.stack([zeros, zeros, zeros + 1.0, max_d], axis=-1)
    return jnp.stack([left, right, bottom, top, near, far], axis=-2)


def cull_lights(
    lights: jnp.ndarray,  # (L, 16) packed GpuLight rows
    view: jnp.ndarray,  # (4, 4)
    inv_projection: jnp.ndarray,  # (4, 4)
    depth: jnp.ndarray,  # (H, W) — may be a band of the framebuffer
    width: int,
    height: int,
    max_per_tile: int = MAX_LIGHTS_PER_TILE,
    tile: int = TILE_SIZE,
    tile_y0=0,  # global tile-row offset of the band (0 = full frame)
) -> TileLights:
    """Full Forward+ culling pass -> per-tile light lists."""
    dmin, dmax = tile_depth_bounds(depth, tile)
    planes = tile_frustum_planes(
        inv_projection, width, height, dmin, dmax, tile, tile_y0=tile_y0
    )

    pos_world = lights[:, 0:3]
    radius = lights[:, 3]
    enabled = lights[:, 15] >= 0.5  # params.w (comp:178)
    pos_view = (
        jnp.einsum("ij,lj->li", view[:3, :3], pos_world) + view[:3, 3]
    )  # (L, 3)

    # (ty, tx, 6, L) signed distances.
    dist = (
        jnp.einsum("yxpc,lc->yxpl", planes[..., :3], pos_view)
        + planes[..., 3:4]
    )
    hit = jnp.all(dist >= -radius[None, None, None, :], axis=2)  # (ty,tx,L)
    hit = hit & enabled[None, None, :]

    # Compact to [idx...] per tile, ascending order (top-k trick).
    l = lights.shape[0]
    k = min(max_per_tile, l)
    light_iota = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 2)
    score = jnp.where(hit, l - light_iota, 0)
    top, _ = jax.lax.top_k(score, k)
    indices = jnp.where(top > 0, l - top, -1).astype(jnp.int32)
    if k < max_per_tile:
        indices = jnp.pad(
            indices, ((0, 0), (0, 0), (0, max_per_tile - k)),
            constant_values=-1,
        )
    counts = jnp.minimum(
        jnp.sum(hit, axis=-1, dtype=jnp.int32), max_per_tile
    )
    return TileLights(mask=hit, indices=indices, counts=counts)


def pack_tile_buffer(tl: TileLights) -> jnp.ndarray:
    """Flatten to the reference's SSBO layout:
    (tiles, MAX_LIGHTS_PER_TILE + 1) u32 with count first
    (comp:41-45, 194-202; light_culling_pipeline.rs tile buffer)."""
    ty, tx, k = tl.indices.shape
    counts = tl.counts.reshape(ty * tx, 1)
    idx = jnp.maximum(tl.indices.reshape(ty * tx, k), 0)
    return jnp.concatenate([counts, idx], axis=-1).astype(jnp.uint32)
