"""Pallas TPU rasterizer kernel.

Same semantics as ops/raster.rasterize (the jnp scan oracle), but built for
the hardware:

- grid = one program per screen tile; the (depth, tri-id) buffers for the
  tile live in VMEM for the whole triangle loop — the scan version instead
  round-trips the full framebuffer through HBM on every one of K steps;
- the per-tile triangle COUNT is scalar-prefetched (SMEM), so each tile
  early-exits after its real triangle list instead of always paying for the
  K-slot capacity — on typical scenes most tiles hold a small fraction of K;
- the triangle loop body is pure VPU work: two edge-function evaluations +
  depth interpolation over the (TILE_H, TILE_W) pixel block, then a masked
  select into the VMEM visibility buffer.

Tile data layout: (num_tiles, K, 16) float32 — x0 y0 x1 y1 x2 y2 z0 z1 z2
area2 tri_id(bitcast) [pad] — gathered by XLA before the kernel (a dense
gather XLA does well; the kernel then streams it tile-block by tile-block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileBins, grid_shape
from .geometry import TriangleSetup
from .raster import VisibilityBuffer, untile

_ROW = 16  # padded per-triangle record width (lane-friendly)


def _pack_tile_data(setup: TriangleSetup, tri_ids: jnp.ndarray) -> jnp.ndarray:
    """(num_tiles, K, 16) packed per-slot records: homogeneous edge matrix
    (9) + clip z (3) + triangle id (1) + pad. Empty slots get tri_id -1."""
    ids = jnp.maximum(tri_ids, 0)
    edge = setup.edge[ids].reshape(*ids.shape, 9)
    zc = setup.z_clip[ids]
    # Triangle ids ride as float32 (exact for ids < 2^24; binning caps T well
    # below that) — scalar bitcasts are not supported by Mosaic.
    fid = tri_ids.astype(jnp.float32)[..., None]
    pad = jnp.zeros((*ids.shape, _ROW - 13), jnp.float32)
    return jnp.concatenate([edge, zc, fid, pad], axis=-1)


def _raster_kernel(
    counts_ref,  # SMEM (num_tiles,) int32 — scalar prefetch
    data_ref,  # VMEM (1, K, 16)
    z_ref,  # VMEM (1, TH, TW) out
    tid_ref,  # VMEM (1, TH, TW) out int32
    *,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    y0: int,
):
    tile = pl.program_id(0)
    base_x = (tile % tiles_x) * tile_w
    base_y = (tile // tiles_x) * tile_h + y0
    px = (
        base_x + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    ).astype(jnp.float32) + 0.5
    py = (
        base_y + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    ).astype(jnp.float32) + 0.5

    z_ref[0] = jnp.ones((tile_h, tile_w), jnp.float32)
    tid_ref[0] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    count = counts_ref[tile]

    def loop(k, _):
        row = data_ref[0, k]
        # Clipless homogeneous coverage (see geometry.TriangleSetup).
        lam0 = row[0] * px + row[1] * py + row[2]
        lam1 = row[3] * px + row[4] * py + row[5]
        lam2 = row[6] * px + row[7] * py + row[8]
        s = lam0 + lam1 + lam2
        z = lam0 * row[9] + lam1 * row[10] + lam2 * row[11]
        tri = row[12].astype(jnp.int32)
        zbuf = z_ref[0]
        # eps tolerance closes shared-edge seams (see ops/raster.py).
        thr = -1e-6 * (jnp.abs(lam0) + jnp.abs(lam1) + jnp.abs(lam2))
        m = (
            (lam0 >= thr)
            & (lam1 >= thr)
            & (lam2 >= thr)
            & (s > 0.0)
            & (tri >= 0)
            & (z >= 0.0)
            & (z <= 1.0)
            & (z < zbuf)
        )
        z_ref[0] = jnp.where(m, z, zbuf)
        tid_ref[0] = jnp.where(m, tri, tid_ref[0])
        return 0

    jax.lax.fori_loop(0, count, loop, 0)


def _raster_kernel2(
    counts_ref,  # SMEM (num_tiles,) int32 — scalar prefetch
    data_ref,  # VMEM (1, K, 16)
    z0_ref,
    t0_ref,
    z1_ref,
    t1_ref,
    *,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    y0: int,
):
    """Two-layer (depth-peeling) variant: nearest + second-nearest."""
    tile = pl.program_id(0)
    base_x = (tile % tiles_x) * tile_w
    base_y = (tile // tiles_x) * tile_h + y0
    px = (
        base_x + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    ).astype(jnp.float32) + 0.5
    py = (
        base_y + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    ).astype(jnp.float32) + 0.5

    ones = jnp.ones((tile_h, tile_w), jnp.float32)
    neg = jnp.full((tile_h, tile_w), -1, jnp.int32)
    z0_ref[0] = ones
    t0_ref[0] = neg
    z1_ref[0] = ones
    t1_ref[0] = neg

    count = counts_ref[tile]

    def loop(k, _):
        row = data_ref[0, k]
        lam0 = row[0] * px + row[1] * py + row[2]
        lam1 = row[3] * px + row[4] * py + row[5]
        lam2 = row[6] * px + row[7] * py + row[8]
        s = lam0 + lam1 + lam2
        z = lam0 * row[9] + lam1 * row[10] + lam2 * row[11]
        tri = row[12].astype(jnp.int32)
        thr = -1e-6 * (jnp.abs(lam0) + jnp.abs(lam1) + jnp.abs(lam2))
        hit = (
            (lam0 >= thr) & (lam1 >= thr) & (lam2 >= thr) & (s > 0.0)
            & (tri >= 0) & (z >= 0.0) & (z <= 1.0)
        )
        z0b, t0b = z0_ref[0], t0_ref[0]
        z1b, t1b = z1_ref[0], t1_ref[0]
        closer = hit & (z < z0b)
        mid = hit & ~closer & (z < z1b)
        z1_ref[0] = jnp.where(closer, z0b, jnp.where(mid, z, z1b))
        t1_ref[0] = jnp.where(closer, t0b, jnp.where(mid, tri, t1b))
        z0_ref[0] = jnp.where(closer, z, z0b)
        t0_ref[0] = jnp.where(closer, tri, t0b)
        return 0

    jax.lax.fori_loop(0, count, loop, 0)


def rasterize_pallas(
    setup: TriangleSetup,
    bins: TileBins,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    y0: int = 0,
    interpret: bool = False,
    layers: int = 1,
) -> VisibilityBuffer:
    """Pallas visibility-buffer rasterizer (TPU). See module docstring.

    layers=2 keeps the two nearest surfaces per pixel (alpha-test support).
    """
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    num_tiles = ty * tx
    k = bins.tri_ids.shape[1]

    tile_data = _pack_tile_data(setup, bins.tri_ids)

    n_out = 2 if layers == 1 else 4
    kernel = functools.partial(
        _raster_kernel if layers == 1 else _raster_kernel2,
        tile_h=tile_h, tile_w=tile_w, tiles_x=tx, y0=y0,
    )
    block = lambda: pl.BlockSpec(  # noqa: E731
        (1, tile_h, tile_w), lambda i, counts: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, k, _ROW), lambda i, counts: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[block() for _ in range(n_out)],
    )
    shapes = []
    for i in range(n_out):
        dtype = jnp.float32 if i % 2 == 0 else jnp.int32
        shapes.append(
            jax.ShapeDtypeStruct((num_tiles, tile_h, tile_w), dtype)
        )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=shapes,
        interpret=interpret,
    )(bins.counts, tile_data)

    def u(x):
        return untile(x, height, width, tile_h, tile_w)

    if layers == 1:
        zbuf, tid = outs
        return VisibilityBuffer(depth=u(zbuf), tri_id=u(tid))
    z0b, t0b, z1b, t1b = outs
    return VisibilityBuffer(
        depth=u(z0b), tri_id=u(t0b), depth2=u(z1b), tri_id2=u(t1b)
    )
