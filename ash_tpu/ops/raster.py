"""Tile-based triangle rasterization -> visibility buffer.

The heart of the TPU pipeline. Where Vulkan's fixed-function rasterizer
scan-converts triangles into fragments, we evaluate barycentric coverage of
each tile's candidate triangles over the whole tile at once with VPU-shaped
vector ops, keeping a (depth, triangle-id) pair per pixel — a *visibility
buffer*. Shading is deferred (ops/shade.py): it re-derives barycentrics from
the winning triangle id, so the raster loop stays tiny (edge functions +
z-test only) and the expensive PBR math runs exactly once per pixel with no
overdraw — the TPU answer to early-z.

Two implementations with identical semantics:
- `rasterize` — pure jnp `lax.scan` over the per-tile triangle list; runs on
  any backend (it is the CPU test oracle) and compiles to a clean VPU loop.
- `rasterize_pallas` (ops/raster_pallas.py) — hand-written Pallas kernel with
  per-tile early exit on the actual triangle count.

Depth semantics match the reference PBR pipeline: CompareOp::LESS, depth range
[0, 1], clear depth 1.0 (renderer.rs:1804-1833, pipeline.rs:206-216). Ties on
equal depth resolve to the EARLIER triangle (sequential submission order),
matching GPU draw order.

No polygon clipping is performed OR needed: coverage/depth evaluate in 2D
homogeneous coordinates (geometry.TriangleSetup), so triangles crossing the
near plane rasterize their in-front part exactly — dynamic clipping would
poison the static shapes the whole TPU pipeline depends on.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import TileBins, grid_shape
from .geometry import TriangleSetup


class VisibilityBuffer(NamedTuple):
    depth: jnp.ndarray  # (H, W) float32, 1.0 = far/clear
    tri_id: jnp.ndarray  # (H, W) int32, -1 = background
    # Second-nearest layer (only when rasterized with layers>=2; else None).
    # Feeds alpha-test resolution: pixels whose nearest triangle is cut out
    # fall through to this layer (depth-K peeling in one pass).
    depth2: Optional[jnp.ndarray] = None
    tri_id2: Optional[jnp.ndarray] = None
    # Layers 3..K stacked (L-2, H, W), nearest first (layers>=3 only).
    depth_rest: Optional[jnp.ndarray] = None
    tri_id_rest: Optional[jnp.ndarray] = None

    @property
    def num_layers(self) -> int:
        n = 1 + (self.depth2 is not None)
        if self.depth_rest is not None:
            n += self.depth_rest.shape[0]
        return n

    def layer(self, i: int):
        """(depth, tri_id) of peel layer i (0 = nearest)."""
        if i == 0:
            return self.depth, self.tri_id
        if i == 1:
            return self.depth2, self.tri_id2
        return self.depth_rest[i - 2], self.tri_id_rest[i - 2]


def _gather_tile_tris(setup: TriangleSetup, tri_ids: jnp.ndarray) -> jnp.ndarray:
    """Pack per-triangle raster data gathered per tile slot.

    Returns (num_tiles, K, 12): the 3x3 homogeneous edge matrix (row-major)
    followed by the 3 clip-space z values. Slot -1 (padding) gathers triangle
    0 but is masked by the id check in the raster loop.
    """
    ids = jnp.maximum(tri_ids, 0)
    edge = setup.edge[ids]  # (num_tiles, K, 3, 3)
    zc = setup.z_clip[ids]  # (num_tiles, K, 3)
    return jnp.concatenate([edge.reshape(*ids.shape, 9), zc], axis=-1)


def _pixel_centers(num_tiles: int, tx: int, tile_h: int, tile_w: int, y0=0):
    """Framebuffer-space pixel-center coordinates per tile: (num_tiles, TH, TW).

    `y0` offsets the band's first row to GLOBAL framebuffer coordinates —
    used when the tile grid is sharded across devices (parallel/sharded.py).
    """
    tile_idx = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1, 1), 0)
    base_x = (tile_idx % tx) * tile_w
    base_y = (tile_idx // tx) * tile_h + y0
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tile_w), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tile_w), 1)
    px = (base_x + ix).astype(jnp.float32) + 0.5
    py = (base_y + iy).astype(jnp.float32) + 0.5
    return px, py


def coverage_and_depth(tri, px, py):
    """Evaluate one triangle per tile over the tile's pixels (clipless
    homogeneous form — see geometry.TriangleSetup).

    tri: (num_tiles, 12) packed row from _gather_tile_tris.
    px/py: (num_tiles, TH, TW) pixel centers.
    Returns (inside (bool), z (f32)) of shape (num_tiles, TH, TW).
    """
    c = lambda i: tri[:, i][:, None, None]  # noqa: E731
    lam0 = c(0) * px + c(1) * py + c(2)
    lam1 = c(3) * px + c(4) * py + c(5)
    lam2 = c(6) * px + c(7) * py + c(8)
    s = lam0 + lam1 + lam2  # = interpolated 1/w; > 0 on the eye side
    # EPS tolerance: edge functions of adjacent triangles are not exact
    # negations in float32 (and XLA's fma contraction can round them
    # differently), so an exact >= 0 test can reject a shared-edge pixel
    # from BOTH triangles, leaving single-pixel seams. The tolerance admits
    # such pixels into either triangle; the depth test resolves the overlap.
    thr = -1e-6 * (jnp.abs(lam0) + jnp.abs(lam1) + jnp.abs(lam2))
    inside = (lam0 >= thr) & (lam1 >= thr) & (lam2 >= thr) & (s > 0.0)
    z = lam0 * c(9) + lam1 * c(10) + lam2 * c(11)
    return inside, z


def untile(buf: jnp.ndarray, height: int, width: int, tile_h: int, tile_w: int):
    """(num_tiles, TH, TW) tiled layout -> (H, W) framebuffer layout."""
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    img = buf.reshape(ty, tx, tile_h, tile_w).transpose(0, 2, 1, 3)
    img = img.reshape(ty * tile_h, tx * tile_w)
    return img[:height, :width]


def tile_image(img: jnp.ndarray, tile_h: int, tile_w: int) -> jnp.ndarray:
    """(H, W) -> (num_tiles, TH, TW), zero padded."""
    h, w = img.shape
    ty, tx = grid_shape(h, w, tile_h, tile_w)
    pad_h, pad_w = ty * tile_h - h, tx * tile_w - w
    img = jnp.pad(img, ((0, pad_h), (0, pad_w)))
    return (
        img.reshape(ty, tile_h, tx, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(ty * tx, tile_h, tile_w)
    )


def rasterize(
    setup: TriangleSetup,
    bins: TileBins,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    unroll: int = 8,
    y0=0,
    layers: int = 1,
    depth_floor=None,
) -> VisibilityBuffer:
    """Scan-based rasterizer: one triangle per tile per scan step.

    The scan carry is the tiled (depth, tri_id) visibility buffer; each step
    tests scan slot k of every tile simultaneously — a dense (num_tiles,
    TH, TW) VPU op. Depth LESS keeps the first (lowest-id) triangle on ties.

    `y0`: global framebuffer row of this band's first row (screen-space
    sharding); `height`/`width` then describe the local band.

    `layers=2` additionally tracks the second-nearest surface per pixel
    (single-pass depth peeling) for alpha-test fallthrough.

    `depth_floor`: optional (H, W) f32 — candidates at z <= floor are
    rejected, which is what lets iterated peeling re-run the raster to
    capture layers K.. (the surfaces STRICTLY behind a previous pass's
    deepest kept layer; coplanar duplicates at exactly the floor depth
    are dropped, the classic depth-peel tie limitation).
    """
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    num_tiles = ty * tx
    k = bins.tri_ids.shape[1]

    tile_data = _gather_tile_tris(setup, bins.tri_ids)  # (num_tiles, K, 12)
    # Force materialization: without the barrier XLA may fuse this gather into
    # the scan body and re-execute it on every one of K steps (measured 10x+
    # slowdown on TPU for the full frame program).
    tile_data = jax.lax.optimization_barrier(tile_data)
    px, py = _pixel_centers(num_tiles, tx, tile_h, tile_w, y0)

    zbuf0 = jnp.ones((num_tiles, tile_h, tile_w), jnp.float32)
    tid0 = jnp.full((num_tiles, tile_h, tile_w), -1, jnp.int32)

    floor = (
        None if depth_floor is None
        else tile_image(depth_floor, tile_h, tile_w)
    )

    if layers == 1:

        def step(carry, inputs):
            zbuf, tid = carry
            tri, ids = inputs  # (num_tiles, 12), (num_tiles,)
            inside, z = coverage_and_depth(tri, px, py)
            ok = ids[:, None, None] >= 0
            if floor is not None:
                ok = ok & (z > floor)
            m = inside & ok & (z >= 0.0) & (z <= 1.0) & (z < zbuf)
            zbuf = jnp.where(m, z, zbuf)
            tid = jnp.where(m, ids[:, None, None], tid)
            return (zbuf, tid), None

        (zbuf, tid), _ = jax.lax.scan(
            step,
            (zbuf0, tid0),
            (tile_data.transpose(1, 0, 2), bins.tri_ids.T),
            length=k,
            unroll=min(unroll, k),
        )
        return VisibilityBuffer(
            depth=untile(zbuf, height, width, tile_h, tile_w),
            tri_id=untile(tid, height, width, tile_h, tile_w),
        )

    # K-layer single-pass depth peeling: each incoming triangle "bubbles"
    # down the per-pixel sorted layer list — at every layer the candidate
    # either displaces the stored surface (taking its place, with the
    # displaced one becoming the new candidate) or passes on. K compare-
    # selects per triangle; identical to the 2-layer closer/mid logic.
    L = layers

    def stepk(carry, inputs):
        zs, ts = carry  # lists of (num_tiles, TH, TW)
        tri, ids = inputs
        inside, z = coverage_and_depth(tri, px, py)
        ok = ids[:, None, None] >= 0
        if floor is not None:
            ok = ok & (z > floor)
        hit = inside & ok & (z >= 0.0) & (z <= 1.0)
        cz, ct = z, jnp.broadcast_to(ids[:, None, None], z.shape)
        new_zs, new_ts = [], []
        for layer_i in range(L):
            swap = hit & (cz < zs[layer_i])
            new_zs.append(jnp.where(swap, cz, zs[layer_i]))
            new_ts.append(jnp.where(swap, ct, ts[layer_i]))
            cz = jnp.where(swap, zs[layer_i], cz)
            ct = jnp.where(swap, ts[layer_i], ct)
        return (new_zs, new_ts), None

    (zs, ts), _ = jax.lax.scan(
        stepk,
        ([zbuf0] * L, [tid0] * L),
        (tile_data.transpose(1, 0, 2), bins.tri_ids.T),
        length=k,
        unroll=min(unroll, k),
    )
    uz = [untile(zb, height, width, tile_h, tile_w) for zb in zs]
    ut = [untile(tb, height, width, tile_h, tile_w) for tb in ts]
    return VisibilityBuffer(
        depth=uz[0],
        tri_id=ut[0],
        depth2=uz[1],
        tri_id2=ut[1],
        depth_rest=jnp.stack(uz[2:]) if L > 2 else None,
        tri_id_rest=jnp.stack(ut[2:]) if L > 2 else None,
    )
