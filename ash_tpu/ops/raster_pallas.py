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

Tile data layout: (num_tiles, K/8, 128) float32 — EIGHT 16-float records per
128-lane row, so the array is exactly lane-aligned. (A (K, 16) layout gets
padded 16 -> 128 lanes by the TPU's T(8,128) tiling: 8x HBM expansion, which
OOMed large-K configs.) Each record: x0 y0 x1 y1 x2 y2 z0 z1 z2 (the 3x3
homogeneous edge matrix) + clip z (3) + tri_id-as-f32 (1) + pad. The kernel
loop consumes one row (8 records, static lane offsets) per iteration —
8x fewer loop iterations as a bonus.
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

_ROW = 16  # per-triangle record width (8 records = one 128-lane row)
_PACK = 8  # records per lane row


def _pack_tile_data(
    setup: TriangleSetup, tri_ids: jnp.ndarray, y0=0
) -> jnp.ndarray:
    """(num_tiles, K/8, 128) packed records (see module docstring). Empty
    slots carry tri_id -1.

    `y0` (static or TRACED — e.g. a shard_map axis_index-derived band
    offset) is folded into the edge constants so the kernel always works in
    band-local pixel rows: lam(x, y_local + y0) = a*x + b*y_local + (c +
    b*y0). Exact (affine translation), and it keeps the Pallas kernel free
    of runtime scalars."""
    ids = jnp.maximum(tri_ids, 0)
    edge = setup.edge[ids]  # (num_tiles, K, 3, 3)
    y0f = jnp.asarray(y0, jnp.float32)
    edge = edge.at[..., 2].add(edge[..., 1] * y0f)
    edge = edge.reshape(*ids.shape, 9)
    zc = setup.z_clip[ids]
    # Triangle ids ride as float32 (exact for ids < 2^24; binning caps T well
    # below that) — scalar bitcasts are not supported by Mosaic.
    fid = tri_ids.astype(jnp.float32)[..., None]
    pad = jnp.zeros((*ids.shape, _ROW - 13), jnp.float32)
    flat = jnp.concatenate([edge, zc, fid, pad], axis=-1)  # (tiles, K, 16)
    nt, k = ids.shape
    return flat.reshape(nt, k // _PACK, _PACK * _ROW)


def _eval_record(block, j, px, py):
    """Coverage + depth of record j (static) of a 128-float row `block`.

    Returns (mask_hit, z, tri_id) over the (TH, TW) pixel block."""
    c = lambda i: block[j * _ROW + i]  # noqa: E731 static lane extract
    lam0 = c(0) * px + c(1) * py + c(2)
    lam1 = c(3) * px + c(4) * py + c(5)
    lam2 = c(6) * px + c(7) * py + c(8)
    s = lam0 + lam1 + lam2
    z = lam0 * c(9) + lam1 * c(10) + lam2 * c(11)
    tri = c(12).astype(jnp.int32)
    # eps tolerance closes shared-edge seams (see ops/raster.py).
    thr = -1e-6 * (jnp.abs(lam0) + jnp.abs(lam1) + jnp.abs(lam2))
    hit = (
        (lam0 >= thr)
        & (lam1 >= thr)
        & (lam2 >= thr)
        & (s > 0.0)
        & (tri >= 0)
        & (z >= 0.0)
        & (z <= 1.0)
    )
    return hit, z, tri


def _pixel_grid(tile_h, tile_w, tiles_x):
    tile = pl.program_id(0)
    base_x = (tile % tiles_x) * tile_w
    base_y = (tile // tiles_x) * tile_h
    px = (
        base_x + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    ).astype(jnp.float32) + 0.5
    py = (
        base_y + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    ).astype(jnp.float32) + 0.5
    return tile, px, py


def _raster_kernel(
    counts_ref,  # SMEM (num_tiles,) int32 — scalar prefetch
    data_ref,  # VMEM (1, K/8, 128)
    z_ref,  # VMEM (1, TH, TW) out
    tid_ref,  # VMEM (1, TH, TW) out int32
    *,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
):
    tile, px, py = _pixel_grid(tile_h, tile_w, tiles_x)

    z_ref[0] = jnp.ones((tile_h, tile_w), jnp.float32)
    tid_ref[0] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    count = counts_ref[tile]

    def loop(i, _):
        block = data_ref[0, i]  # (128,) = 8 records
        zbuf, tid = z_ref[0], tid_ref[0]
        for j in range(_PACK):
            hit, z, tri = _eval_record(block, j, px, py)
            m = hit & (z < zbuf)
            zbuf = jnp.where(m, z, zbuf)
            tid = jnp.where(m, tri, tid)
        z_ref[0] = zbuf
        tid_ref[0] = tid
        return 0

    jax.lax.fori_loop(0, (count + _PACK - 1) // _PACK, loop, 0)


def _raster_kernel_layers(
    counts_ref,  # SMEM (num_tiles,) int32 — scalar prefetch
    *refs,  # data_ref [, floor_ref], then z/t ref pairs per layer (VMEM)
    layers: int,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    has_floor: bool = False,
):
    """K-layer (depth-peeling) variant: the K nearest surfaces per pixel.

    Each hit bubbles down the per-pixel sorted layer list — at every layer
    the candidate either displaces the stored surface (the displaced one
    becomes the new candidate) or passes on. For K=2 this reduces exactly
    to the classic closer/mid two-layer peel. `has_floor` adds a per-pixel
    minimum-depth input (iterated peeling: only surfaces STRICTLY behind
    the floor are kept).
    """
    data_ref = refs[0]
    base = 2 if has_floor else 1
    floor = refs[1][0] if has_floor else None
    z_refs = refs[base : base + 2 * layers : 2]
    t_refs = refs[base + 1 : base + 1 + 2 * layers : 2]
    tile, px, py = _pixel_grid(tile_h, tile_w, tiles_x)

    ones = jnp.ones((tile_h, tile_w), jnp.float32)
    neg = jnp.full((tile_h, tile_w), -1, jnp.int32)
    for zr, tr in zip(z_refs, t_refs):
        zr[0] = ones
        tr[0] = neg

    count = counts_ref[tile]

    def loop(i, _):
        block = data_ref[0, i]
        zs = [zr[0] for zr in z_refs]
        ts = [tr[0] for tr in t_refs]
        for j in range(_PACK):
            hit, cz, ct = _eval_record(block, j, px, py)
            if floor is not None:
                hit = hit & (cz > floor)
            for li in range(layers):
                swap = hit & (cz < zs[li])
                zs[li], cz = (
                    jnp.where(swap, cz, zs[li]),
                    jnp.where(swap, zs[li], cz),
                )
                ts[li], ct = (
                    jnp.where(swap, ct, ts[li]),
                    jnp.where(swap, ts[li], ct),
                )
        for li in range(layers):
            z_refs[li][0] = zs[li]
            t_refs[li][0] = ts[li]
        return 0

    jax.lax.fori_loop(0, (count + _PACK - 1) // _PACK, loop, 0)


def rasterize_pallas(
    setup: TriangleSetup,
    bins: TileBins,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    y0=0,
    interpret: bool = False,
    layers: int = 1,
    depth_floor=None,
) -> VisibilityBuffer:
    """Pallas visibility-buffer rasterizer (TPU). See module docstring.

    layers=2 keeps the two nearest surfaces per pixel (alpha-test support).
    `y0` may be traced (band offset under shard_map) — it is folded into the
    packed edge constants, not the kernel.
    `depth_floor` ((H, W) f32, layers>=2 only): reject candidates at
    z <= floor — the iterated-peel second pass.
    """
    ty, tx = grid_shape(height, width, tile_h, tile_w)
    num_tiles = ty * tx
    k = bins.tri_ids.shape[1]
    if k % _PACK:
        pad = _PACK - k % _PACK
        bins = bins._replace(
            tri_ids=jnp.pad(bins.tri_ids, ((0, 0), (0, pad)),
                            constant_values=-1)
        )
        k += pad

    tile_data = _pack_tile_data(setup, bins.tri_ids, y0)

    n_out = 2 * layers
    if depth_floor is not None and layers < 2:
        raise ValueError("depth_floor needs layers >= 2")
    if layers == 1:
        kernel = functools.partial(
            _raster_kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tx,
        )
    else:
        kernel = functools.partial(
            _raster_kernel_layers, layers=layers,
            tile_h=tile_h, tile_w=tile_w, tiles_x=tx,
            has_floor=depth_floor is not None,
        )
    block = lambda: pl.BlockSpec(  # noqa: E731
        (1, tile_h, tile_w), lambda i, counts: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(
            (1, k // _PACK, _PACK * _ROW), lambda i, counts: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [tile_data]
    if depth_floor is not None:
        from .raster import tile_image

        in_specs.append(block())
        inputs.append(tile_image(depth_floor, tile_h, tile_w))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=in_specs,
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
    )(bins.counts, *inputs)

    def u(x):
        return untile(x, height, width, tile_h, tile_w)

    if layers == 1:
        zbuf, tid = outs
        return VisibilityBuffer(depth=u(zbuf), tri_id=u(tid))
    uz = [u(outs[2 * i]) for i in range(layers)]
    ut = [u(outs[2 * i + 1]) for i in range(layers)]
    return VisibilityBuffer(
        depth=uz[0], tri_id=ut[0], depth2=uz[1], tri_id2=ut[1],
        depth_rest=jnp.stack(uz[2:]) if layers > 2 else None,
        tri_id_rest=jnp.stack(ut[2:]) if layers > 2 else None,
    )
