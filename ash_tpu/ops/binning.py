"""Triangle -> screen-tile binning.

The TPU replacement for the GPU's hardware rasterizer scheduling: the screen is
divided into tiles (default 64 x 128 pixels — sublane x lane aligned for the
VPU), and each tile gets a bounded, ordered list of candidate triangles. The
per-tile lists are built with dense vectorized ops (a (tiles, T) overlap
matrix + top_k compaction) — no atomics, matching the design note in
SURVEY.md §5.7 where the reference's shared-memory atomic allocation
(shaders/light_culling.comp:186-190, occlusion_cull.comp:228) becomes
sort/top-k compaction.

Triangle ORDER within a tile list is preserved (ascending triangle id), which
gives the same first-wins depth-test tie-breaking as sequential draw order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    tri_ids: jnp.ndarray  # (num_tiles, K) int32, -1 padded, ascending ids
    counts: jnp.ndarray  # (num_tiles,) int32 number of valid entries
    overflow: jnp.ndarray  # () int32: max overlow amount over tiles (0 = ok)


def grid_shape(height: int, width: int, tile_h: int, tile_w: int):
    return (-(-height // tile_h), -(-width // tile_w))


def _keep_rank(keep_score: jnp.ndarray) -> tuple:
    """(rank, rank_to_id) for overflow prioritization.

    rank[i] in [0, T): HIGHER rank = kept longer. Ties (equal score) give
    the LOWER triangle id the higher rank, preserving draw-order semantics.
    rank_to_id inverts the mapping for id recovery after top_k.
    """
    t = keep_score.shape[0]
    ids = jnp.arange(t, dtype=jnp.int32)
    # Sort ascending by (score, -id): the FIRST entries are dropped first.
    order = jnp.lexsort((-ids, keep_score))  # (T,) tri id at each rank
    rank = jnp.zeros(t, jnp.int32).at[order].set(ids)
    return rank, order


def _ascending_ids(tri_ids: jnp.ndarray) -> jnp.ndarray:
    """Sort each tile's kept ids ascending with -1 padding at the end."""
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(tri_ids >= 0, tri_ids, big)
    key = jnp.sort(key, axis=-1)
    return jnp.where(key == big, -1, key)


def bin_triangles(
    bbox: jnp.ndarray,  # (T, 4) fb-space [x0, y0, x1, y1]
    valid: jnp.ndarray,  # (T,) bool
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
    y0=0,
    keep_score=None,  # (T,) float32: on overflow keep HIGHEST scores
) -> TileBins:
    """Build per-tile triangle lists from conservative bbox/tile overlap.

    Returns lists of triangle ids (ascending, -1-padded). `overflow` reports
    by how much the worst tile exceeded `max_per_tile` (those triangles are
    dropped — callers surface this through diagnostics, see
    render_stats.CullingStats).

    `keep_score` selects WHICH triangles a full tile drops: None keeps the
    lowest draw ids (submission order); passing e.g. negated depth keeps the
    NEAREST triangles, so drops are (almost always occluded) back surfaces
    instead of arbitrary draws. Kept lists are ascending id either way.

    `y0`: global framebuffer row of this band's first tile row — bboxes stay
    in global coordinates, the grid covers [y0, y0 + height).
    """
    t = bbox.shape[0]
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    num_tiles = ty * tx

    # Triangles entirely outside the band contribute nothing. The
    # horizontal check matters too: the tile-range clamp below would
    # otherwise fold a fully-offscreen-left/right bbox into the edge
    # tile column, wasting slots (and potentially overflowing a tile)
    # on triangles that cover no pixel.
    valid = (
        valid
        & (bbox[:, 3] >= y0) & (bbox[:, 1] < y0 + height)
        & (bbox[:, 2] >= 0.0) & (bbox[:, 0] < width)
    )

    # Tile index ranges covered by each bbox (inclusive), clamped to the grid.
    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / tile_w), 0, tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((bbox[:, 1] - y0) / tile_h), 0, ty - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(bbox[:, 2] / tile_w), 0, tx - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((bbox[:, 3] - y0) / tile_h), 0, ty - 1).astype(jnp.int32)

    tile_row = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0) // tx
    tile_col = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0) % tx

    overlap = (
        valid[None, :]
        & (tile_col >= tx0[None, :])
        & (tile_col <= tx1[None, :])
        & (tile_row >= ty0[None, :])
        & (tile_row <= ty1[None, :])
    )  # (num_tiles, T)

    counts_full = jnp.sum(overlap, axis=1, dtype=jnp.int32)
    overflow = jnp.maximum(jnp.max(counts_full) - max_per_tile, 0)

    k = min(max_per_tile, t)
    if keep_score is None:
        # Score overlapping triangles so that LOWER ids get HIGHER scores,
        # take top-k -> ascending id order among the kept ones.
        tri_iota = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, t), 1)
        score = jnp.where(overlap, t - tri_iota, 0)
        top, _ = jax.lax.top_k(score, k)  # (num_tiles, k), descending
        tri_ids = jnp.where(top > 0, t - top, -1).astype(jnp.int32)
    else:
        rank, rank_to_id = _keep_rank(keep_score)
        score = jnp.where(overlap, rank[None, :] + 1, 0)
        top, _ = jax.lax.top_k(score, k)
        tri_ids = jnp.where(
            top > 0, rank_to_id[jnp.maximum(top - 1, 0)], -1
        ).astype(jnp.int32)
        tri_ids = _ascending_ids(tri_ids)
    if k < max_per_tile:
        tri_ids = jnp.pad(
            tri_ids, ((0, 0), (0, max_per_tile - k)), constant_values=-1
        )
    counts = jnp.minimum(counts_full, max_per_tile)
    return TileBins(tri_ids=tri_ids, counts=counts, overflow=overflow)


def bin_triangles_two_level(
    bbox: jnp.ndarray,  # (T, 4) fb-space [x0, y0, x1, y1]
    valid: jnp.ndarray,  # (T,) bool
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
    y0=0,
    coarse_tiles: tuple = (4, 2),  # fine tiles per coarse tile (y, x)
    coarse_cap: int = 16384,
    keep_score=None,  # (T,) f32: on overflow keep HIGHEST scores
) -> TileBins:
    """Coarse -> fine hierarchical binning for large triangle counts.

    The dense single-level binner builds a (tiles x T) overlap matrix —
    O(tiles * T) memory and top_k work, which cliffs at multi-100k-triangle
    scenes (VERDICT round-1 weak #3; the reference's hardware rasterizer has
    no such cliff). Here triangles first bin into coarse super-tiles
    (`coarse_tiles` fine tiles each) with the dense method, then each fine
    tile refines only its parent's <= coarse_cap candidates:

        dense:      tiles * T            (1080p/32x128: 510 * T)
        two-level:  C * T + tiles * Kc   (C ~ 64, Kc = coarse_cap)

    For T = 1M that is ~30x less top_k work and bounded (tiles, Kc)
    intermediates. Output contract matches bin_triangles exactly (ascending
    ids, -1 padding); `overflow` reports the worst of the coarse and fine
    drops so callers see every lost triangle.
    """
    t = bbox.shape[0]
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    cy_f, cx_f = coarse_tiles
    # Pad the fine grid up to whole coarse tiles.
    ty_p = -(-ty // cy_f) * cy_f
    tx_p = -(-tx // cx_f) * cx_f
    cy, cx = ty_p // cy_f, tx_p // cx_f
    kc = min(coarse_cap, t)

    # --- Coarse pass: dense bin into (cy * cx) super-tiles.
    coarse = bin_triangles(
        bbox, valid, ty_p * tile_h, tx_p * tile_w,
        tile_h * cy_f, tile_w * cx_f, kc, y0=y0, keep_score=keep_score,
    )
    cand = coarse.tri_ids.reshape(cy, cx, kc)  # ascending ids, -1 pad

    # --- Fine pass: test each coarse tile's candidates against its fine
    # tiles only. Work/memory: (cy*cx, cy_f*cx_f, kc).
    cb = bbox[jnp.maximum(cand, 0)]  # (cy, cx, kc, 4)
    cvalid = cand >= 0

    # Fine-tile pixel ranges, band-global like bin_triangles.
    fy = jax.lax.broadcasted_iota(jnp.int32, (cy, cx, cy_f, cx_f), 2)
    fx = jax.lax.broadcasted_iota(jnp.int32, (cy, cx, cy_f, cx_f), 3)
    gy = jax.lax.broadcasted_iota(jnp.int32, (cy, cx, cy_f, cx_f), 0) * cy_f + fy
    gx = jax.lax.broadcasted_iota(jnp.int32, (cy, cx, cy_f, cx_f), 1) * cx_f + fx
    py0 = gy * tile_h + y0  # global pixel row of the fine tile's first row
    px0 = gx * tile_w
    e = lambda a: a[:, :, :, :, None]  # noqa: E731 (cy,cx,fy,fx,1)
    b = lambda i: cb[:, :, None, None, :, i]  # noqa: E731 (cy,cx,1,1,kc)
    overlap = (
        cvalid[:, :, None, None, :]
        & (b(2) >= px0[..., None].astype(jnp.float32))
        & (b(0) < (e(px0) + tile_w).astype(jnp.float32))
        & (b(3) >= py0[..., None].astype(jnp.float32))
        & (b(1) < (e(py0) + tile_h).astype(jnp.float32))
    )  # (cy, cx, cy_f, cx_f, kc)

    counts_full = jnp.sum(overlap, axis=-1, dtype=jnp.int32)
    k = min(max_per_tile, kc)
    if keep_score is None:
        # Keep the FIRST k candidates per fine tile (slots are already in
        # ascending triangle id order from the coarse pass).
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 4)
        score = jnp.where(overlap, kc - slot_iota, 0)
        top, _ = jax.lax.top_k(score, k)  # descending score = asc. slot
        slots = jnp.clip(kc - top, 0, kc - 1)
        fine_ids = jnp.take_along_axis(
            jnp.broadcast_to(cand[:, :, None, None, :], overlap.shape),
            slots, axis=-1,
        )[..., :k]
        fine_ids = jnp.where(top > 0, fine_ids, -1).astype(jnp.int32)
    else:
        # Keep the HIGHEST-score candidates (e.g. nearest-first drops).
        rank, rank_to_id = _keep_rank(keep_score)
        slot_rank = rank[jnp.maximum(cand, 0)]  # (cy, cx, kc)
        score = jnp.where(
            overlap, slot_rank[:, :, None, None, :] + 1, 0
        )
        top, _ = jax.lax.top_k(score, k)
        fine_ids = jnp.where(
            top > 0, rank_to_id[jnp.maximum(top - 1, 0)], -1
        ).astype(jnp.int32)
        fine_ids = _ascending_ids(fine_ids)
    if k < max_per_tile:
        fine_ids = jnp.pad(
            fine_ids,
            ((0, 0),) * 4 + ((0, max_per_tile - k),),
            constant_values=-1,
        )

    # (cy, cx, cy_f, cx_f, K) -> row-major fine-tile order, minus grid pad.
    fine_ids = (
        fine_ids.transpose(0, 2, 1, 3, 4)
        .reshape(ty_p, tx_p, max_per_tile)[:ty, :tx]
        .reshape(ty * tx, max_per_tile)
    )
    counts = (
        jnp.minimum(counts_full, max_per_tile)
        .transpose(0, 2, 1, 3)
        .reshape(ty_p, tx_p)[:ty, :tx]
        .reshape(ty * tx)
    )
    # Overflow over the REAL fine grid only: the (ty_p, tx_p) pad tiles lie
    # off-screen, yet unclamped bboxes (screen-edge and near-plane-crossing
    # triangles get full-screen boxes) land candidates in them — counting
    # those reported phantom drops (taint pixel + stats) for triangles
    # whose real tiles were fine.
    counts_real = (
        counts_full.transpose(0, 2, 1, 3).reshape(ty_p, tx_p)[:ty, :tx]
    )
    overflow = jnp.maximum(jnp.max(counts_real) - max_per_tile, 0)
    # Coarse drops also lose triangles (they never reach the fine pass).
    overflow = jnp.maximum(overflow, coarse.overflow)
    return TileBins(tri_ids=fine_ids, counts=counts, overflow=overflow)
