"""Vertex transform + triangle setup — the TPU vertex stage.

Replaces the reference's hardware vertex stage (shaders/vert.vert) with batched
matrix math over SoA vertex arrays. Where Vulkan fetches vertices per draw call
and runs a vertex shader, we transform EVERY vertex of the frame's draw list in
one shot:

- world position:   gathered per-vertex model matrix (4x4) applied via einsum
- world normal/tangent: per-draw normal matrix (inverse-transpose, computed
  in-jit, reference renderer.rs:1654 / vert.vert:37-40)
- clip position:    view_proj @ world (vert.vert:33)

then computes per-triangle raster setup (framebuffer-space vertices, depths,
1/w, validity, bbox) consumed by binning + rasterization.

Conventions (must match the reference's Vulkan pipeline):
- clip -> NDC by divide by w; NDC z in [0, 1] (glam perspective_rh).
- framebuffer x = (ndc.x + 1) * W/2, y = (ndc.y + 1) * H/2, row 0 at top.
  (The application's projection already contains the Vulkan Y-flip.)
- Facing: Vulkan computes orientation with a NEGATED shoelace sum in y-down
  framebuffer coords (VkSpec 28.x "Basic Polygon Rasterization"); with
  front_face = COUNTER_CLOCKWISE and our conventions, front faces have
  negative `area2` (= standard shoelace cross). The PBR pass culls BACK
  (renderer.rs:599), the shadow pass culls FRONT (renderer.rs:660).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Minimum clip-space w: triangles with any vertex closer than this are
# discarded rather than clipped (guard-band approach; see module docs of
# ops/raster.py for the tradeoff).
NEAR_EPS = 1e-6


class TransformedVerts(NamedTuple):
    """Per-vertex frame data (all instance-expanded, length V)."""

    world: jnp.ndarray  # (V, 3) world position
    clip: jnp.ndarray  # (V, 4) clip position
    normal: jnp.ndarray  # (V, 3) world-space normal (normalized)
    tangent: jnp.ndarray  # (V, 4) world-space tangent xyz + handedness w


class TriangleSetup(NamedTuple):
    """Per-triangle raster setup (length T).

    `edge` holds the CLIPLESS (2D homogeneous) rasterization coefficients:
    for viewport-scaled clip coordinates p_i = (a_i, b_i, c_i) with
    a = (x_clip + w) * W/2, b = (y_clip + w) * H/2, c = w (all LINEAR in
    clip space — no divide), edge[i] is row i of adj(M)/det(M) where M has
    the p_i as columns. Then for a pixel q = (px, py, 1):

        lam_i(q) = edge[i] . q          (homogeneous barycentric / w)
        inside   = all lam_i >= 0 and sum(lam_i) > 0 (front side of the eye)
        z(q)     = sum_i lam_i * z_clip_i        (NDC depth, no divide)
        weights  = lam_i / sum(lam)              (perspective-correct)

    This handles triangles CROSSING THE NEAR PLANE without polygon clipping
    (Olano-Greer style homogeneous rasterization) — the natural fit for a
    static-shape TPU pipeline, where clipping's dynamic triangle counts
    would poison every downstream shape.
    """

    xy: jnp.ndarray  # (T, 3, 2) fb-space positions (w>0 verts; diagnostics)
    z: jnp.ndarray  # (T, 3) NDC depth per vertex (w>0 verts)
    inv_w: jnp.ndarray  # (T, 3) 1/clip_w per vertex
    area2: jnp.ndarray  # (T,) signed shoelace cross in fb coords (w>0 tris)
    valid: jnp.ndarray  # (T,) bool: passes degenerate/cull/scissor tests
    bbox: jnp.ndarray  # (T, 4) float [x0, y0, x1, y1] fb bounds
    edge: jnp.ndarray  # (T, 3, 3) adj(M)/det rows (see above)
    z_clip: jnp.ndarray  # (T, 3) clip-space z per vertex
    det: jnp.ndarray  # (T,) homogeneous orientation (front <=> det < 0)


def inverse_transpose_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched (…,3,3) inverse-transpose via adjugate — cheap, closed form.

    Used for normal matrices ((model^-1)^T, reference renderer.rs:1654).
    """
    a = m
    # Cofactor matrix C with C[i,j] = cofactor of a[i,j]; inv = C^T / det,
    # so inverse-transpose = C / det.
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    cof = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    )
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    return cof / det[..., None, None]


def transform_vertices(
    models: jnp.ndarray,  # (D, 4, 4) per-draw model matrices
    view_proj: jnp.ndarray,  # (4, 4)
    positions: jnp.ndarray,  # (Vu, 3) UNIQUE mesh-pool attributes
    normals: jnp.ndarray,  # (Vu, 3)
    tangents: jnp.ndarray,  # (Vu, 4)
    vert_draw: jnp.ndarray,  # (Ve,) int32 draw id per EXPANDED vertex
    vert_uid: Optional[jnp.ndarray] = None,  # (Ve,) int32 -> unique vertex
) -> TransformedVerts:
    """The vertex stage: world/clip/normal/tangent for every scene vertex.

    Mirrors shaders/vert.vert:30-43, batched over the whole draw list.
    With `vert_uid`, attributes live once per unique mesh and instances are
    expanded here by gather — true instancing: the static scene stores one
    copy of each mesh (instancing.rs:16's shared-vertex-buffer contract);
    only the transformed outputs are per-instance, and only transiently.
    """
    if vert_uid is not None:
        positions = positions[vert_uid]
        normals = normals[vert_uid]
        tangents = tangents[vert_uid]
    m = models[vert_draw]  # (Ve, 4, 4) gather
    world = (
        jnp.einsum("vij,vj->vi", m[:, :3, :3], positions,
                   precision="highest", preferred_element_type=jnp.float32)
        + m[:, :3, 3]
    )
    clip = (
        jnp.einsum("ij,vj->vi", view_proj[:, :3], world,
                   precision="highest", preferred_element_type=jnp.float32)
        + view_proj[:, 3]
    )
    # Per-DRAW inverse-transpose, then gather: the adjugate+det is ~30
    # flops and XLA cannot CSE it across the `models[vert_draw]` gather,
    # so computing it on the (Ve, 3, 3) expanded matrices redid it
    # millions of times for only D distinct draws at instancing scale.
    nmat = inverse_transpose_3x3(models[:, :3, :3])[vert_draw]  # (Ve, 3, 3)
    n = jnp.einsum("vij,vj->vi", nmat, normals,
                   precision="highest", preferred_element_type=jnp.float32)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    t = jnp.einsum("vij,vj->vi", nmat, tangents[:, :3],
                   precision="highest", preferred_element_type=jnp.float32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    tangent = jnp.concatenate([t, tangents[:, 3:4]], axis=-1)
    return TransformedVerts(world=world, clip=clip, normal=n, tangent=tangent)


def clip_to_framebuffer(clip: jnp.ndarray, width: int, height: int):
    """NDC divide + viewport transform. Returns (xy (V,2), z (V,), inv_w (V,))."""
    w = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) < NEAR_EPS, NEAR_EPS, w)
    inv_w = 1.0 / safe_w
    ndc = clip[:, :3] * inv_w[:, None]
    x = (ndc[:, 0] + 1.0) * (0.5 * width)
    y = (ndc[:, 1] + 1.0) * (0.5 * height)
    return jnp.stack([x, y], axis=-1), ndc[:, 2], inv_w


def triangle_setup(
    clip: jnp.ndarray,  # (V, 4)
    tri_v: jnp.ndarray,  # (T, 3) int32 vertex ids
    tri_valid: jnp.ndarray,  # (T,) bool (padding mask)
    width: int,
    height: int,
    cull_mode: str = "back",
) -> TriangleSetup:
    """Per-triangle clipless raster setup (see TriangleSetup) with face
    culling and scissor rejection.

    cull_mode: 'back' (PBR pass), 'front' (shadow pass), 'none'.
    """
    xy_all, z_all, inv_w_all = clip_to_framebuffer(clip, width, height)
    xy = xy_all[tri_v]  # (T, 3, 2)
    z = z_all[tri_v]  # (T, 3)
    inv_w = inv_w_all[tri_v]
    tclip = clip[tri_v]  # (T, 3, 4)
    w = tclip[..., 3]  # (T, 3)

    v0, v1, v2 = xy[:, 0], xy[:, 1], xy[:, 2]
    area2 = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - (
        v1[:, 1] - v0[:, 1]
    ) * (v2[:, 0] - v0[:, 0])

    # Viewport-scaled homogeneous columns p_i = (a_i, b_i, c_i): LINEAR in
    # clip coordinates, finite even for w <= 0.
    a = (tclip[..., 0] + w) * (0.5 * width)  # (T, 3)
    b = (tclip[..., 1] + w) * (0.5 * height)
    c = w
    cols = jnp.stack([a, b, c], axis=-1)  # (T, 3[vertex], 3[component])
    p0, p1, p2 = cols[:, 0], cols[:, 1], cols[:, 2]
    e0 = jnp.cross(p1, p2)  # adjugate rows: lam_0 coefficients
    e1 = jnp.cross(p2, p0)
    e2 = jnp.cross(p0, p1)
    det = jnp.sum(p0 * e0, axis=-1)  # (T,)

    # Facing in homogeneous space: same sign convention as area2 when all
    # w > 0 (front <=> negative), and remains correct for near-crossers.
    if cull_mode == "back":
        face_ok = det < 0.0
    elif cull_mode == "front":
        face_ok = det > 0.0
    elif cull_mode == "none":
        face_ok = det != 0.0
    else:  # pragma: no cover - config error
        raise ValueError(f"bad cull_mode {cull_mode!r}")

    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    edge = jnp.stack([e0, e1, e2], axis=1) * inv_det[:, None, None]
    z_clip = tclip[..., 2]

    # Bounding box: projected bbox when fully in front; near-crossers extend
    # unboundedly in screen space -> conservative full-screen bbox.
    all_front = jnp.all(w > NEAR_EPS, axis=-1)
    any_front = jnp.any(w > NEAR_EPS, axis=-1)
    x0 = jnp.min(xy[:, :, 0], axis=-1)
    x1 = jnp.max(xy[:, :, 0], axis=-1)
    y0 = jnp.min(xy[:, :, 1], axis=-1)
    y1 = jnp.max(xy[:, :, 1], axis=-1)
    fw = jnp.float32(width)
    fh = jnp.float32(height)
    x0 = jnp.where(all_front, x0, 0.0)
    y0 = jnp.where(all_front, y0, 0.0)
    x1 = jnp.where(all_front, x1, fw)
    y1 = jnp.where(all_front, y1, fh)
    on_screen = (x1 >= 0.0) & (x0 < width) & (y1 >= 0.0) & (y0 < height)
    depth_ok = jnp.where(
        all_front,
        (jnp.max(z, axis=-1) >= 0.0) & (jnp.min(z, axis=-1) <= 1.0),
        True,  # cannot bound depth for near-crossers; per-pixel test decides
    )

    valid = tri_valid & any_front & face_ok & on_screen & depth_ok
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)
    return TriangleSetup(
        xy=xy, z=z, inv_w=inv_w, area2=area2, valid=valid, bbox=bbox,
        edge=edge, z_clip=z_clip, det=det,
    )


def barycentrics(
    xy: jnp.ndarray,  # (..., 3, 2) triangle fb vertices
    area2: jnp.ndarray,  # (...)
    px: jnp.ndarray,  # (...) pixel center x
    py: jnp.ndarray,  # (...) pixel center y
):
    """Screen-space barycentric coordinates (lam0, lam1, lam2).

    lam_i >= 0 for all i <=> pixel inside, independent of winding sign
    (each edge function carries the same sign as area2).
    """
    x0, y0 = xy[..., 0, 0], xy[..., 0, 1]
    x1, y1 = xy[..., 1, 0], xy[..., 1, 1]
    x2, y2 = xy[..., 2, 0], xy[..., 2, 1]
    inv_area = 1.0 / jnp.where(area2 == 0.0, 1.0, area2)
    # e0: edge v1->v2 (opposite vertex 0), etc.
    e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    lam0 = e0 * inv_area
    lam1 = e1 * inv_area
    lam2 = 1.0 - lam0 - lam1
    return lam0, lam1, lam2


def perspective_weights(lam, inv_w):
    """Perspective-correct interpolation weights from screen-space
    barycentrics and per-vertex 1/w. Returns (w0, w1, w2) summing to 1."""
    l0, l1, l2 = lam
    p0 = l0 * inv_w[..., 0]
    p1 = l1 * inv_w[..., 1]
    p2 = l2 * inv_w[..., 2]
    s = p0 + p1 + p2
    s = jnp.where(jnp.abs(s) < 1e-12, 1.0, s)
    return p0 / s, p1 / s, p2 / s
