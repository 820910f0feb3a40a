"""Screen-space SPMD rendering: shard the frame across a TPU mesh.

The reference is a single-GPU renderer (SURVEY.md §5.8: no multi-device path
exists); its internal parallelism is screen tiling. That tiling is exactly
what scales across chips on TPU: the rasterizer already works on bands of
tile rows (ops/raster.py `y0`), so multi-chip rendering is `shard_map` over a
1D device mesh where

- scene buffers + uniforms are REPLICATED (the vertex stage is cheap:
  redundant compute beats communicating triangles),
- each device bins + rasters + shades its horizontal band of the framebuffer
  (tile-disjoint writes -> no cross-device raster communication at all),
- the shadow map is rendered band-wise and `all_gather`ed along the mesh
  (every device needs the whole map for PCF sampling) — one (S/n, S) x n
  gather riding ICI per frame,
- the final image assembles implicitly via the out_spec partitioning.

This gives near-linear scaling in the raster/shade stages (the frame cost is
dominated by per-pixel work) with a single small collective.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import binning, geometry, raster
from ..ops.shade import ShadeUniforms, interpolate_gbuffer, shade_flat, shade_pbr
from ..render.frame import FrameConfig, FrameUniforms, _srgb_encode
from ..render.scene import SceneBuffers


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def make_sharded_frame(config: FrameConfig, mesh: Mesh, axis: str = "sp"):
    """Build a jitted SPMD frame function over `mesh` (1D, axis `axis`).

    Returns fn(scene: SceneBuffers, uni: FrameUniforms) -> (H, W, 4) uint8.
    The framebuffer is padded so each device owns an equal band of tile rows;
    the returned image is cropped back to (height, width).
    """
    n = mesh.shape[axis]
    cfg = config
    pad_h = _ceil_to(cfg.height, n * cfg.tile_h)
    band_h = pad_h // n
    s = cfg.shadow_resolution
    if cfg.shadow_enabled:
        if s % (n * cfg.shadow_tile) != 0:
            raise ValueError(
                f"shadow_resolution {s} must divide into {n} bands of "
                f"{cfg.shadow_tile}-row tiles"
            )
        shadow_band = s // n

    def device_fn(scene: SceneBuffers, uni: FrameUniforms):
        idx = jax.lax.axis_index(axis)
        y0 = idx * band_h

        tv = geometry.transform_vertices(
            uni.models, uni.view_proj, scene.position, scene.normal,
            scene.tangent, scene.vert_draw,
        )

        shadow_map = None
        if cfg.shadow_enabled:
            world4 = jnp.concatenate(
                [tv.world, jnp.ones_like(tv.world[:, :1])], -1
            )
            clip_l = jnp.einsum(
                "ij,vj->vi", uni.light_space_matrix, world4,
                preferred_element_type=jnp.float32,
            )
            setup_s = geometry.triangle_setup(
                clip_l, scene.tri_v, scene.tri_valid, s, s, cull_mode="front"
            )
            sy0 = idx * shadow_band
            bins_s = binning.bin_triangles(
                setup_s.bbox, setup_s.valid, shadow_band, s,
                cfg.shadow_tile, cfg.shadow_tile,
                cfg.shadow_max_tris_per_tile, y0=sy0,
            )
            vis_s = raster.rasterize(
                setup_s, bins_s, shadow_band, s,
                cfg.shadow_tile, cfg.shadow_tile, y0=sy0,
            )
            # Every device needs the full map for PCF -> gather over ICI.
            shadow_map = jax.lax.all_gather(
                vis_s.depth, axis, axis=0, tiled=True
            )

        # Viewport transform uses the TRUE height; pad_h only extends the
        # raster grid (padded rows stay background and are cropped).
        setup = geometry.triangle_setup(
            tv.clip, scene.tri_v, scene.tri_valid, cfg.width, cfg.height,
            cull_mode="back",
        )
        bins = binning.bin_triangles(
            setup.bbox, setup.valid, band_h, cfg.width,
            cfg.tile_h, cfg.tile_w, cfg.max_tris_per_tile, y0=y0,
        )
        vis = raster.rasterize(
            setup, bins, band_h, cfg.width, cfg.tile_h, cfg.tile_w, y0=y0
        )
        gbuf = interpolate_gbuffer(
            vis.tri_id, setup, scene.tri_v, scene.tri_draw, tv,
            scene.uv, scene.color, y0=y0,
        )
        if cfg.shading == "flat":
            color = shade_flat(gbuf, clear_color=cfg.clear_color)
        else:
            color = shade_pbr(
                gbuf, scene.materials,
                ShadeUniforms(
                    camera_pos=uni.camera_pos,
                    light_direction=uni.light_direction,
                    light_color=uni.light_color,
                    ambient_color=uni.ambient_color,
                    light_space_matrix=uni.light_space_matrix,
                ),
                shadow_map=shadow_map,
                pool=None,
                clear_color=cfg.clear_color,
                reinhard=cfg.reinhard,
            )
        encoded = _srgb_encode(color) if cfg.srgb_output else color
        rgb = jnp.clip(encoded * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        alpha = jnp.full((band_h, cfg.width, 1), 255, jnp.uint8)
        return jnp.concatenate([rgb, alpha], axis=-1)

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P()),  # scene + uniforms replicated
        out_specs=P(axis),  # image bands concatenate along rows
        check_vma=False,
    )

    @jax.jit
    def frame(scene: SceneBuffers, uni: FrameUniforms):
        img = sharded(scene, uni)
        return img[: cfg.height]

    return frame


def render_mesh(n_devices: Optional[int] = None, axis: str = "sp") -> Mesh:
    """1D screen-parallel device mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(devices[:n], (axis,))
