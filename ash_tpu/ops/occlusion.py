"""GPU occlusion culling — port of shaders/occlusion_cull.comp.

Per object (the shader runs 64-wide workgroups over objects; here all objects
vectorize at once):
1. world-space bounds: model-transformed center + axis-length-scaled extents
   (occlusion_cull.comp:199-206, rotation deliberately approximated);
2. frustum cull with the positive-vertex AABB test (comp:103-116);
3. Hi-Z test: project the 8 corners, take the screen AABB, pick
   mip = ceil(log2(max projected extent)) and compare the box's nearest
   depth against the pyramid sample at the box center (comp:123-178);
4. compaction of survivors into an ordered draw list — the TPU version of
   the atomicAdd indirect-command append (comp:224-232), via prefix sum.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .compute_utils import aabb_in_frustum, extract_frustum_planes, prefix_sum_compact
from .hiz import HizPyramid, sample_level

MAX_CULLABLE_OBJECTS = 65536  # reference occlusion_culling.rs:17-21


class CullResult(NamedTuple):
    visibility: jnp.ndarray  # (N,) int32 1 = visible (comp's VisibilityBuffer)
    draw_list: jnp.ndarray  # (N,) int32 compacted visible ids, -1 padded
    visible_count: jnp.ndarray  # () int32


def world_bounds(
    centers: jnp.ndarray,  # (N, 3) local AABB centers
    extents: jnp.ndarray,  # (N, 3) local half extents
    models: jnp.ndarray,  # (N, 4, 4)
):
    """comp:199-206: exact center transform, axis-scale extents."""
    wc = (
        jnp.einsum("nij,nj->ni", models[:, :3, :3], centers) + models[:, :3, 3]
    )
    scale = jnp.linalg.norm(models[:, :3, :3], axis=2)  # |model[i].xyz| rows
    we = extents * scale
    return wc, we


def occlusion_test(
    centers_w: jnp.ndarray,  # (N, 3)
    extents_w: jnp.ndarray,  # (N, 3)
    view_proj: jnp.ndarray,  # (4, 4)
    pyr: HizPyramid,
    width: int,
    height: int,
) -> jnp.ndarray:
    """True = occluded (comp:123-178)."""
    n = centers_w.shape[0]
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32,
    )  # (8, 3)
    corners = centers_w[:, None, :] + extents_w[:, None, :] * signs[None]
    c4 = jnp.concatenate([corners, jnp.ones((n, 8, 1))], axis=-1)
    clip = jnp.einsum("ij,nkj->nki", view_proj, c4)
    w = clip[..., 3]
    behind = jnp.any(w <= 0.0, axis=-1)  # conservative visible (comp:145-147)
    safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = clip[..., :3] / safe_w[..., None]
    screen = ndc[..., :2] * 0.5 + 0.5
    min_s = jnp.clip(jnp.min(screen, axis=1), 0.0, 1.0)
    max_s = jnp.clip(jnp.max(screen, axis=1), 0.0, 1.0)
    min_z = jnp.min(ndc[..., 2], axis=1)

    size_px = (max_s - min_s) * jnp.asarray([width, height], jnp.float32)
    mip = jnp.ceil(jnp.log2(jnp.maximum(jnp.max(size_px, axis=-1), 1e-8)))
    mip = jnp.clip(mip, 0.0, pyr.levels - 1).astype(jnp.int32)

    center_uv = (min_s + max_s) * 0.5
    hiz_depth = sample_level(pyr, mip, center_uv[:, 0], center_uv[:, 1])
    occluded = min_z > hiz_depth
    return jnp.where(behind, False, occluded)


def cull_objects(
    centers: jnp.ndarray,  # (N, 3) local centers
    extents: jnp.ndarray,  # (N, 3) local half extents
    models: jnp.ndarray,  # (N, 4, 4)
    enabled: jnp.ndarray,  # (N,) bool (flags & 1, comp:194-197)
    view_proj: jnp.ndarray,
    pyr: Optional[HizPyramid],
    width: int,
    height: int,
) -> CullResult:
    """Frustum + Hi-Z cull -> visibility flags + compacted draw list.

    pyr=None skips the occlusion test (frustum-only culling)."""
    wc, we = world_bounds(centers, extents, models)
    planes = extract_frustum_planes(view_proj)
    in_frustum = aabb_in_frustum(wc, we, planes)
    if pyr is not None:
        occluded = occlusion_test(wc, we, view_proj, pyr, width, height)
    else:
        occluded = jnp.zeros(wc.shape[0], bool)
    visible = enabled & in_frustum & ~occluded
    draw_list, count = prefix_sum_compact(visible, visible.shape[0])
    return CullResult(
        visibility=visible.astype(jnp.int32),
        draw_list=draw_list,
        visible_count=count,
    )
