"""Triangle -> screen-tile binning.

The TPU replacement for the GPU's hardware rasterizer scheduling: the screen is
divided into tiles (default 32 x 128 pixels — sublane x lane aligned for the
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


def bin_triangles(
    bbox: jnp.ndarray,  # (T, 4) fb-space [x0, y0, x1, y1]
    valid: jnp.ndarray,  # (T,) bool
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
    y0=0,
) -> TileBins:
    """Build per-tile triangle lists from conservative bbox/tile overlap.

    Returns lists of triangle ids (ascending, -1-padded). `overflow` reports
    by how much the worst tile exceeded `max_per_tile` (those triangles are
    dropped — callers surface this through diagnostics, see
    render_stats.CullingStats).

    `y0`: global framebuffer row of this band's first tile row — bboxes stay
    in global coordinates, the grid covers [y0, y0 + height).
    """
    t = bbox.shape[0]
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    num_tiles = ty * tx

    # Triangles entirely outside the band contribute nothing.
    valid = valid & (bbox[:, 3] >= y0) & (bbox[:, 1] < y0 + height)

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

    # Compact: score overlapping triangles so that LOWER ids get HIGHER
    # scores, take top-k -> ascending id order among the kept ones.
    tri_iota = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, t), 1)
    score = jnp.where(overlap, t - tri_iota, 0)
    k = min(max_per_tile, t)
    top, _ = jax.lax.top_k(score, k)  # (num_tiles, k), descending score
    tri_ids = jnp.where(top > 0, t - top, -1).astype(jnp.int32)
    if k < max_per_tile:
        tri_ids = jnp.pad(
            tri_ids, ((0, 0), (0, max_per_tile - k)), constant_values=-1
        )
    counts = jnp.minimum(counts_full, max_per_tile)
    return TileBins(tri_ids=tri_ids, counts=counts, overflow=overflow)
