"""Packed scene buffers — the TPU-side "uploaded" scene.

Replaces the reference's per-mesh Vulkan vertex/index buffers + per-draw
uniform updates (src/renderer/model_renderer.rs upload/draw paths) with flat,
padded, HBM-resident arrays covering the whole draw list.

TRUE INSTANCING (two-level mesh x instance layout): vertex ATTRIBUTES are
stored ONCE per unique mesh (position/normal/uv/color/tangent of length Vu);
instances contribute only two int32 expansion maps — `vert_uid` (expanded
vertex -> unique vertex) and `vert_draw` (expanded vertex -> draw id) — plus
triangle index arrays. A 65,536-instance batch over a shared mesh
(instancing.rs:16's contract) therefore stores the mesh's floats once; the
per-instance transforms materialize only transiently inside the jitted frame
(the vertex stage gathers unique attributes and applies the per-draw model,
exactly like a GPU vertex shader re-runs per instance). Expansion maps are
built with vectorized numpy (np.repeat / arange arithmetic), not Python
loops, so 65k-instance scenes pack in milliseconds.

LOD: a mesh's whole chain (Mesh.lods) is packed together; every triangle
carries its level in `tri_lod`, and `lod_thresholds` holds each draw's
padded screen-coverage switch points (selection happens IN-JIT by masking
triangles of non-selected levels — the TPU form of per-frame draw-list
rebuild, reference lod_system.rs:300-346).

Everything is padded to size buckets so the jitted frame function retraces
only when the scene grows past a bucket boundary, not on every edit
(the TPU analog of the reference's pipeline-cache + persistent buffers).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh
from ..core.uniform import MATERIAL_RECORD_SIZE, MaterialUniform

MAX_LOD_LEVELS = 8  # reference lod_system.rs MAX_LOD_LEVELS


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

    # Unique per-mesh attribute pool (length Vu).
    position: jnp.ndarray  # (Vu, 3)
    normal: jnp.ndarray  # (Vu, 3)
    uv: jnp.ndarray  # (Vu, 2)
    color: jnp.ndarray  # (Vu, 3)
    tangent: jnp.ndarray  # (Vu, 4)
    # Instance expansion maps (length Ve = sum over draws of mesh verts).
    vert_uid: jnp.ndarray  # (Ve,) int32 -> unique vertex
    vert_draw: jnp.ndarray  # (Ve,) int32 -> draw id
    # Triangles index EXPANDED vertex ids.
    tri_v: jnp.ndarray  # (Te, 3) int32 (into Ve)
    tri_draw: jnp.ndarray  # (Te,) int32
    tri_valid: jnp.ndarray  # (Te,) bool
    tri_lod: jnp.ndarray  # (Te,) int32 LOD level of the triangle
    materials: jnp.ndarray  # (D, MATERIAL_RECORD_SIZE)
    # Per-draw local AABBs for GPU-driven culling (padding draws disabled).
    draw_center: jnp.ndarray  # (D, 3)
    draw_extents: jnp.ndarray  # (D, 3)
    draw_enabled: jnp.ndarray  # (D,) bool
    # Per-draw LOD switch points, +inf padded; the draw's LAST real level
    # holds -inf so selection always lands (see frame.render_band).
    lod_thresholds: jnp.ndarray  # (D, MAX_LOD_LEVELS)

    @property
    def num_unique_vertices(self) -> int:
        return int(self.position.shape[0])

    @property
    def num_vertices(self) -> int:
        return int(self.vert_uid.shape[0])

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
    num_vertices: int  # expanded
    scene_center: np.ndarray
    scene_radius: float
    has_lods: bool = False
    # Host-side LOD metadata for stats (per draw: triangle count per level).
    lod_level_triangles: Optional[np.ndarray] = None  # (D, MAX_LOD_LEVELS)
    # Host copies for on-demand diagnostics (no device readbacks needed).
    lod_thresholds_host: Optional[np.ndarray] = None  # (D, MAX_LOD_LEVELS)
    draw_center_host: Optional[np.ndarray] = None  # (D, 3)
    draw_extents_host: Optional[np.ndarray] = None  # (D, 3)
    # World AABB the (center, radius) sphere was fitted to. The chunked
    # path unions these across chunks so its shadow auto-fit is BIT-EXACT
    # with the fused path's (the sphere union alone would be looser).
    scene_lo: Optional[np.ndarray] = None  # (3,)
    scene_hi: Optional[np.ndarray] = None  # (3,)


class _PackedMesh(NamedTuple):
    voff: int  # offset into the unique vertex pool
    nverts: int  # expanded verts this mesh contributes per instance
    tris: np.ndarray  # (Tm, 3) int32 LOCAL indices (into this mesh's verts)
    tri_lod: np.ndarray  # (Tm,) int32
    center: np.ndarray
    extents: np.ndarray
    thresholds: np.ndarray  # (MAX_LOD_LEVELS,) f32 padded switch points
    level_tris: np.ndarray  # (MAX_LOD_LEVELS,) int32 triangles per level
    corners: np.ndarray  # (8, 3) local AABB corners (shadow fitting)


def _pack_mesh(mesh: Mesh) -> tuple:
    """Concatenate a mesh's LOD chain into one local vertex/triangle block.

    Returns (vertex_arrays_parts, _PackedMesh-without-voff fields)."""
    levels = [mesh] + [m for m, _ in mesh.lods]
    if len(levels) > MAX_LOD_LEVELS:
        raise ValueError(f"more than {MAX_LOD_LEVELS} LOD levels")
    parts, tris, lods, level_tris = [], [], [], []
    off = 0
    for li, lv in enumerate(levels):
        parts.append(lv.vertices)
        t = lv.triangle_indices + off
        tris.append(t)
        lods.append(np.full(t.shape[0], li, np.int32))
        level_tris.append(t.shape[0])
        off += len(lv.vertices)
    thr = np.full(MAX_LOD_LEVELS, np.inf, np.float32)
    for j, (_, s) in enumerate(mesh.lods):
        thr[j] = s  # level j selected while coverage >= lods[j].threshold
    thr[len(levels) - 1] = -np.inf  # last level: always selectable
    lt = np.zeros(MAX_LOD_LEVELS, np.int32)
    lt[: len(levels)] = level_tris
    c, e = mesh.bounds()
    lo, hi = c - e, c + e
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])], np.float32,
    )
    return parts, np.concatenate(tris).astype(np.int32), np.concatenate(
        lods
    ), c, e, thr, lt, corners, off


def build_scene(
    draw_items: List[DrawItem],
    meshes: Dict[str, Mesh],
) -> BuiltScene:
    """Pack a draw list into device buffers (numpy -> jnp on return)."""
    if not draw_items:
        raise ValueError("empty draw list")

    # --- Unique mesh pool: each referenced mesh (incl. LOD chain) once.
    packed: Dict[str, _PackedMesh] = {}
    pool_parts = []
    voff = 0
    for item in draw_items:
        key = item.mesh_key
        if key in packed:
            continue
        parts, tris, tri_lod, c, e, thr, lt, corners, nv = _pack_mesh(
            meshes[key]
        )
        pool_parts.extend(parts)
        packed[key] = _PackedMesh(
            voff=voff, nverts=nv, tris=tris, tri_lod=tri_lod, center=c,
            extents=e, thresholds=thr, level_tris=lt, corners=corners,
        )
        voff += nv
    from ..core.mesh import VertexArrays

    pool = VertexArrays.concatenate(pool_parts)

    # --- Vectorized instance expansion.
    nd = len(draw_items)
    keys = [it.mesh_key for it in draw_items]
    pm = [packed[k] for k in keys]
    vcounts = np.array([p.nverts for p in pm], np.int64)
    tcounts = np.array([p.tris.shape[0] for p in pm], np.int64)
    mesh_voff = np.array([p.voff for p in pm], np.int64)

    ve = int(vcounts.sum())
    voffs_item = np.concatenate([[0], np.cumsum(vcounts)[:-1]])
    vert_item = np.repeat(np.arange(nd), vcounts)  # (Ve,)
    within_v = np.arange(ve) - voffs_item[vert_item]
    vert_uid = (mesh_voff[vert_item] + within_v).astype(np.int32)
    vert_draw = vert_item.astype(np.int32)

    te = int(tcounts.sum())
    toffs_item = np.concatenate([[0], np.cumsum(tcounts)[:-1]])
    tri_item = np.repeat(np.arange(nd), tcounts)  # (Te,)
    within_t = np.arange(te) - toffs_item[tri_item]
    # Per-unique-mesh triangle tables, indexed (mesh, local tri).
    all_tris = {k: p.tris for k, p in packed.items()}
    mesh_order = list(packed)
    mesh_index = {k: i for i, k in enumerate(mesh_order)}
    tris_cat = np.concatenate([all_tris[k] for k in mesh_order])
    lods_cat = np.concatenate([packed[k].tri_lod for k in mesh_order])
    mesh_toff = np.concatenate(
        [[0], np.cumsum([all_tris[k].shape[0] for k in mesh_order])[:-1]]
    )
    item_midx = np.array([mesh_index[k] for k in keys], np.int64)
    global_tri = mesh_toff[item_midx[tri_item]] + within_t
    tri_v = (
        tris_cat[global_tri] + voffs_item[tri_item][:, None]
    ).astype(np.int32)
    tri_lod = lods_cat[global_tri].astype(np.int32)
    tri_draw = tri_item.astype(np.int32)

    # --- Per-draw tables.
    models = np.stack(
        [np.asarray(it.model, np.float32) for it in draw_items]
    )  # (D, 4, 4)
    mats = np.stack([it.packed_material() for it in draw_items]).astype(
        np.float32
    )
    centers = np.stack([p.center for p in pm])
    extents = np.stack([p.extents for p in pm])
    thresholds = np.stack([p.thresholds for p in pm])
    level_tris = np.stack([p.level_tris for p in pm])
    has_lods = bool((level_tris[:, 1] > 0).any())

    # World AABB for shadow fitting: batched corner transform.
    corners = np.stack([p.corners for p in pm])  # (D, 8, 3)
    wc = (
        np.einsum("dij,dcj->dci", models[:, :3, :3], corners)
        + models[:, None, :3, 3]
    )
    lo = wc.reshape(-1, 3).min(axis=0)
    hi = wc.reshape(-1, 3).max(axis=0)

    nv_e, nt, ndr = ve, te, nd
    pv_u = _bucket(len(pool))
    pv_e, pt, pd = _bucket(nv_e), _bucket(nt), _bucket(ndr, minimum=1)

    def padv(a, n, fill=0.0):
        a = np.asarray(a)
        out = np.full((n, *a.shape[1:]), fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    buffers = SceneBuffers(
        position=jnp.asarray(padv(pool.position, pv_u)),
        normal=jnp.asarray(padv(pool.normal, pv_u)),
        uv=jnp.asarray(padv(pool.uv, pv_u)),
        color=jnp.asarray(padv(pool.color, pv_u)),
        tangent=jnp.asarray(padv(pool.tangent, pv_u)),
        vert_uid=jnp.asarray(padv(vert_uid, pv_e)),
        vert_draw=jnp.asarray(padv(vert_draw, pv_e)),
        tri_v=jnp.asarray(padv(tri_v, pt)),
        tri_draw=jnp.asarray(padv(tri_draw, pt)),
        tri_valid=jnp.asarray(padv(np.ones(nt, bool), pt, fill=False)),
        tri_lod=jnp.asarray(padv(tri_lod, pt)),
        materials=jnp.asarray(padv(mats, pd)),
        draw_center=jnp.asarray(padv(centers, pd)),
        draw_extents=jnp.asarray(padv(extents, pd)),
        draw_enabled=jnp.asarray(padv(np.ones(ndr, bool), pd, fill=False)),
        lod_thresholds=jnp.asarray(
            padv(thresholds, pd, fill=np.float32(np.inf))
        ),
    )
    center = ((lo + hi) * 0.5).astype(np.float32)
    radius = float(np.linalg.norm(hi - center))
    return BuiltScene(
        buffers=buffers,
        num_draws=ndr,
        num_triangles=nt,
        num_vertices=nv_e,
        scene_center=center,
        scene_radius=max(radius, 1e-3),
        has_lods=has_lods,
        lod_level_triangles=level_tris,
        lod_thresholds_host=thresholds,
        draw_center_host=centers,
        draw_extents_host=extents,
        scene_lo=lo.astype(np.float32),
        scene_hi=hi.astype(np.float32),
    )


def build_models(draw_items: List[DrawItem], num_draws_padded: int) -> np.ndarray:
    """(D_pad, 4, 4) model matrices for the current frame (identity pad)."""
    out = np.tile(np.eye(4, dtype=np.float32), (num_draws_padded, 1, 1))
    if draw_items:
        out[: len(draw_items)] = np.stack(
            [np.asarray(it.model, np.float32) for it in draw_items]
        )
    return out
