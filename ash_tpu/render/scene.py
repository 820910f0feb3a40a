"""Packed scene buffers — the TPU-side "uploaded" scene.

Replaces the reference's per-mesh Vulkan vertex/index buffers + per-draw
uniform updates (src/renderer/model_renderer.rs upload/draw paths) with ONE
set of flat, padded, HBM-resident arrays covering the whole draw list:

- vertex attributes are concatenated across all draw items (instances are
  expanded: each draw item contributes its mesh's vertices with its own draw
  id), so the vertex stage is a single batched transform;
- triangles carry a draw id, giving every pass (raster, shading, shadows)
  direct access to per-draw materials without per-draw dispatch;
- everything is padded to size buckets so the jitted frame function retraces
  only when the scene grows past a bucket boundary, not on every edit
  (the TPU analog of the reference's pipeline-cache + persistent buffers).

This per-draw-item expansion trades HBM for uniformity (1000 cubes = 24k
vertices = ~1.4 MB — negligible). A two-level (mesh x instance) scheme can
replace it later for very large instance counts without changing the frame
function's interface.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh
from ..core.uniform import MATERIAL_RECORD_SIZE, MaterialUniform


@dataclasses.dataclass
class DrawItem:
    """One draw: mesh + model transform + material + bindless texture ids.

    Mirrors the reference DrawItem (renderer.rs:252-260)."""

    mesh_key: str
    model: np.ndarray  # (4, 4) float32
    material: MaterialUniform

    def packed_material(self) -> np.ndarray:
        return self.material.pack()


class SceneBuffers(NamedTuple):
    """Device-resident packed scene (all shapes static per bucket)."""

    position: jnp.ndarray  # (V, 3)
    normal: jnp.ndarray  # (V, 3)
    uv: jnp.ndarray  # (V, 2)
    color: jnp.ndarray  # (V, 3)
    tangent: jnp.ndarray  # (V, 4)
    vert_draw: jnp.ndarray  # (V,) int32
    tri_v: jnp.ndarray  # (T, 3) int32 (into V)
    tri_draw: jnp.ndarray  # (T,) int32
    tri_valid: jnp.ndarray  # (T,) bool
    materials: jnp.ndarray  # (D, MATERIAL_RECORD_SIZE)
    # Per-draw local AABBs for GPU-driven culling (padding draws disabled).
    draw_center: jnp.ndarray  # (D, 3)
    draw_extents: jnp.ndarray  # (D, 3)
    draw_enabled: jnp.ndarray  # (D,) bool

    @property
    def num_vertices(self) -> int:
        return int(self.position.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.tri_v.shape[0])

    @property
    def num_draws(self) -> int:
        return int(self.materials.shape[0])


def _bucket(n: int, minimum: int = 16) -> int:
    """Round up to the next power of two (>= minimum) to stabilize shapes."""
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class BuiltScene:
    buffers: SceneBuffers
    num_draws: int  # real (unpadded) draw count
    num_triangles: int
    num_vertices: int
    scene_center: np.ndarray
    scene_radius: float


def build_scene(
    draw_items: List[DrawItem],
    meshes: Dict[str, Mesh],
) -> BuiltScene:
    """Pack a draw list into device buffers (numpy -> jnp on return)."""
    if not draw_items:
        raise ValueError("empty draw list")

    pos, nrm, uvs, col, tan = [], [], [], [], []
    vdraw, tris, tdraw = [], [], []
    mats, centers, extents = [], [], []
    voff = 0
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for di, item in enumerate(draw_items):
        mesh = meshes[item.mesh_key]
        v = mesh.vertices
        nv = len(v)
        pos.append(v.position)
        nrm.append(v.normal)
        uvs.append(v.uv)
        col.append(v.color)
        tan.append(v.tangent)
        vdraw.append(np.full(nv, di, np.int32))
        t = mesh.triangle_indices + voff
        tris.append(t)
        tdraw.append(np.full(t.shape[0], di, np.int32))
        mats.append(item.packed_material())
        c, e = mesh.bounds()
        centers.append(c)
        extents.append(e)
        voff += nv
        # World-space AABB contribution for shadow fitting.
        m = np.asarray(item.model, np.float32)
        wp = v.position @ m[:3, :3].T + m[:3, 3]
        lo = np.minimum(lo, wp.min(axis=0))
        hi = np.maximum(hi, wp.max(axis=0))

    position = np.concatenate(pos).astype(np.float32)
    tri_v = np.concatenate(tris).astype(np.int32)

    nv, nt, nd = position.shape[0], tri_v.shape[0], len(draw_items)
    pv, pt, pd = _bucket(nv), _bucket(nt), _bucket(nd, minimum=1)

    def padv(a, n, fill=0.0):
        a = np.asarray(a)
        out = np.full((n, *a.shape[1:]), fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    buffers = SceneBuffers(
        position=jnp.asarray(padv(position, pv)),
        normal=jnp.asarray(padv(np.concatenate(nrm).astype(np.float32), pv)),
        uv=jnp.asarray(padv(np.concatenate(uvs).astype(np.float32), pv)),
        color=jnp.asarray(padv(np.concatenate(col).astype(np.float32), pv)),
        tangent=jnp.asarray(padv(np.concatenate(tan).astype(np.float32), pv)),
        vert_draw=jnp.asarray(padv(np.concatenate(vdraw), pv)),
        tri_v=jnp.asarray(padv(tri_v, pt)),
        tri_draw=jnp.asarray(padv(np.concatenate(tdraw), pt)),
        tri_valid=jnp.asarray(
            padv(np.ones(nt, bool), pt, fill=False)
        ),
        materials=jnp.asarray(
            padv(np.stack(mats).astype(np.float32), pd)
        ),
        draw_center=jnp.asarray(padv(np.stack(centers), pd)),
        draw_extents=jnp.asarray(padv(np.stack(extents), pd)),
        draw_enabled=jnp.asarray(padv(np.ones(nd, bool), pd, fill=False)),
    )
    center = ((lo + hi) * 0.5).astype(np.float32)
    radius = float(np.linalg.norm(hi - center))
    return BuiltScene(
        buffers=buffers,
        num_draws=nd,
        num_triangles=nt,
        num_vertices=nv,
        scene_center=center,
        scene_radius=max(radius, 1e-3),
    )


def build_models(draw_items: List[DrawItem], num_draws_padded: int) -> np.ndarray:
    """(D_pad, 4, 4) model matrices for the current frame (identity pad)."""
    out = np.tile(np.eye(4, dtype=np.float32), (num_draws_padded, 1, 1))
    if draw_items:
        out[: len(draw_items)] = np.stack(
            [np.asarray(it.model, np.float32) for it in draw_items]
        )
    return out
