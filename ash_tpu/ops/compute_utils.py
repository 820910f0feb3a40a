"""Compute utility library — TPU counterpart of shaders/compute_utils.glsl.

The reference ships a GLSL library of workgroup reductions (compute_utils.glsl
:18-66), a Blelloch exclusive prefix sum over 256 elements (:72-110), frustum
plane extraction + sphere/AABB tests (:116-177), and depth linearization
(:181-193). On TPU the shared-memory machinery disappears: reductions are
jnp reductions, the prefix scan is `jax.lax.associative_scan`/cumsum, and the
geometric helpers are plain vectorized math. Stream compaction (the
reference's atomicAdd slot allocation) becomes `prefix_sum_compact`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reduce_min(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Workgroup min reduction (compute_utils.glsl:18-32)."""
    return jnp.min(x, axis=axis)


def reduce_max(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.max(x, axis=axis)


def reduce_sum(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.sum(x, axis=axis)


def exclusive_prefix_sum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive scan (Blelloch scan, compute_utils.glsl:72-110)."""
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


def prefix_sum_compact(mask: jnp.ndarray, capacity: int):
    """Stream compaction: indices where mask is True, in order, padded -1.

    The TPU replacement for `slot = atomicAdd(count); out[slot] = i`
    (occlusion_cull.comp:228-231, light_culling.comp:186-190): deterministic,
    order-preserving, no contention. Returns (indices (capacity,), count ()).
    """
    n = mask.shape[0]
    slots = exclusive_prefix_sum(mask.astype(jnp.int32))
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # One dump slot past the end absorbs every non-write (unmasked ids and
    # masked ids beyond capacity), so each REAL slot is written by at most
    # one id — no reliance on JAX's undefined duplicate-scatter ordering,
    # and a full buffer (count == capacity) keeps its last entry intact.
    out = jnp.full((capacity + 1,), -1, jnp.int32)
    write_to = jnp.where(mask & (slots < capacity), slots, capacity)
    out = out.at[write_to].set(idx)
    return out[:capacity], jnp.minimum(count, capacity)


def extract_frustum_planes(view_proj: jnp.ndarray) -> jnp.ndarray:
    """6 normalized world-space planes from a VP matrix, rows convention
    (occlusion_cull.comp:82-100 / compute_utils.glsl:116-137).

    Our matrices are row-major math (M @ v); GLSL's vp[i] are COLUMNS of the
    column-major matrix == our rows of M^T; the classic Gribb-Hartmann
    extraction in our convention uses rows: left = r3 + r0, etc.
    Returns (6, 4): [left, right, bottom, top, near, far].
    """
    r0, r1, r2, r3 = view_proj[0], view_proj[1], view_proj[2], view_proj[3]
    planes = jnp.stack(
        [r3 + r0, r3 - r0, r3 + r1, r3 - r1, r3 + r2, r3 - r2]
    )
    norm = jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(norm, 1e-8)


def sphere_in_frustum(center, radius, planes) -> jnp.ndarray:
    """True if the sphere intersects/inside all 6 planes
    (compute_utils.glsl sphere test / light_culling.comp:101-109).
    center (..., 3), radius (...,), planes (6, 4) -> (...)."""
    dist = jnp.einsum("pc,...c->...p", planes[:, :3], center) + planes[:, 3]
    return jnp.all(dist >= -radius[..., None], axis=-1)


def aabb_in_frustum(center, extents, planes) -> jnp.ndarray:
    """Positive-vertex AABB/frustum test (occlusion_cull.comp:103-116).
    Returns True if NOT culled."""
    n = planes[:, :3]  # (6, 3)
    pos_vertex = center[..., None, :] + extents[..., None, :] * jnp.sign(n)
    dist = jnp.sum(n * pos_vertex, axis=-1) + planes[:, 3]
    return jnp.all(dist >= 0.0, axis=-1)


def linearize_depth(depth: jnp.ndarray, near: float, far: float) -> jnp.ndarray:
    """[0,1] reversed-range NDC depth -> view-space distance
    (compute_utils.glsl:181-193 convention)."""
    return near * far / jnp.maximum(far - depth * (far - near), 1e-8)
