"""Shadow-map sampling: 16-tap PCF via 4 gather quads.

Numerical port of the reference's optimized PCF (shaders/frag.frag:48-88):
4 textureGather calls at (+-1, +-1) texel offsets, each yielding a 2x2 depth
quad, compared against (currentDepth - slope_bias) -> 16 binary taps averaged.

Sampler semantics replicated from the reference shadow sampler
(src/renderer/shadow_map.rs:190-205): CLAMP_TO_BORDER with a WHITE border, so
out-of-map taps read depth 1.0 (never in shadow).

The light-space -> [0,1]^3 mapping matches frag.frag:50-52 exactly, including
its quirk of also remapping z by *0.5+0.5 (the reference's light projection
already produces z in [0,1]; we reproduce the same arithmetic so shadow
placement is bit-comparable).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_quad(depth_map: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """textureGather on a (S, S) depth map at normalized (u, v).

    Returns the 2x2 bilinear footprint texels, shape (..., 4). Out-of-bounds
    texels read as 1.0 (white border).
    """
    s_y, s_x = depth_map.shape
    px = u * s_x - 0.5
    py = v * s_y - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    taps = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < s_x) & (yi >= 0) & (yi < s_y)
            xi_c = jnp.clip(xi, 0, s_x - 1)
            yi_c = jnp.clip(yi, 0, s_y - 1)
            d = depth_map[yi_c, xi_c]
            taps.append(jnp.where(inb, d, 1.0))
    return jnp.stack(taps, axis=-1)


def shadow_pcf16(
    shadow_map: jnp.ndarray,  # (S, S) light-space depth
    frag_pos_light: jnp.ndarray,  # (..., 4) light-space clip position
    normal: jnp.ndarray,  # (..., 3) geometric normal
    light_dir: jnp.ndarray,  # (..., 3) or (3,) direction TOWARD light
) -> jnp.ndarray:
    """Fraction of the 16 PCF taps in shadow, 0..1 (frag.frag:48-88)."""
    w = frag_pos_light[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    proj = frag_pos_light[..., :3] / safe_w[..., None]
    proj = proj * 0.5 + 0.5
    current = proj[..., 2]

    ndl = jnp.sum(normal * light_dir, axis=-1)
    bias = jnp.maximum(0.05 * (1.0 - ndl), 0.005)
    compare = (current - bias)[..., None]

    s = shadow_map.shape[0]
    ts = 1.0 / s
    u, v = proj[..., 0], proj[..., 1]
    shadow = jnp.zeros_like(current)
    for ox, oy in ((-1.0, -1.0), (1.0, -1.0), (-1.0, 1.0), (1.0, 1.0)):
        quad = gather_quad(shadow_map, u + ox * ts, v + oy * ts)
        shadow = shadow + jnp.sum((compare > quad).astype(jnp.float32), axis=-1)
    shadow = shadow / 16.0

    # Outside the light frustum far plane -> no shadow (frag.frag:60-61).
    return jnp.where(proj[..., 2] > 1.0, 0.0, shadow)


def _gather_quad_layered(maps: jnp.ndarray, layer: jnp.ndarray, u, v):
    """textureGather on a (C, S, S) cascade array at a per-pixel layer."""
    c, s_y, s_x = maps.shape
    flat = maps.reshape(-1)
    px = u * s_x - 0.5
    py = v * s_y - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    base = layer * (s_y * s_x)
    taps = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < s_x) & (yi >= 0) & (yi < s_y)
            idx = base + jnp.clip(yi, 0, s_y - 1) * s_x + jnp.clip(xi, 0, s_x - 1)
            taps.append(jnp.where(inb, flat[idx], 1.0))
    return jnp.stack(taps, axis=-1)


def _pcf16_at_layer(cascade_maps, cascade_matrices, layer, world, bias):
    """16-tap PCF against one per-pixel cascade layer."""
    mats = cascade_matrices[layer]  # (..., 4, 4)
    w4 = jnp.concatenate([world, jnp.ones_like(world[..., :1])], -1)
    pos_light = jnp.einsum("...ij,...j->...i", mats, w4)
    w = pos_light[..., 3]
    proj = pos_light[..., :3] / jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)[..., None]
    proj = proj * 0.5 + 0.5
    compare = (proj[..., 2] - bias)[..., None]

    s = cascade_maps.shape[1]
    ts = 1.0 / s
    u, v = proj[..., 0], proj[..., 1]
    shadow = jnp.zeros_like(proj[..., 2])
    for ox, oy in ((-1.0, -1.0), (1.0, -1.0), (-1.0, 1.0), (1.0, 1.0)):
        quad = _gather_quad_layered(cascade_maps, layer, u + ox * ts, v + oy * ts)
        shadow = shadow + jnp.sum((compare > quad).astype(jnp.float32), axis=-1)
    shadow = shadow / 16.0
    return jnp.where(proj[..., 2] > 1.0, 0.0, shadow)


def shadow_pcf16_csm(
    cascade_maps: jnp.ndarray,  # (C, S, S) per-cascade depth
    cascade_matrices: jnp.ndarray,  # (C, 4, 4) light-space matrices
    split_distances: jnp.ndarray,  # (C,) cascade far distances (view space)
    view: jnp.ndarray,  # (4, 4) camera view matrix
    world: jnp.ndarray,  # (..., 3) world position
    normal: jnp.ndarray,  # (..., 3)
    light_dir: jnp.ndarray,  # (..., 3) toward light
    blend_size: float = 0.0,  # CsmConfig.blend_size (NDC-ish fraction); 0=hard
) -> jnp.ndarray:
    """Cascaded 16-tap PCF: select the cascade by view-space distance
    (split scheme from render/csm.py, reference shadow.rs), apply the same
    PCF kernel as the single-map path, and optionally blend with the next
    cascade near split boundaries (CsmConfig.blend_cascades/blend_size)."""
    c = cascade_maps.shape[0]
    view_z = -(
        jnp.einsum("j,...j->...", view[2, :3], world) + view[2, 3]
    )  # positive distance in front of the camera
    layer = jnp.sum(
        (view_z[..., None] > split_distances[:c]).astype(jnp.int32), axis=-1
    )
    layer = jnp.clip(layer, 0, c - 1)

    ndl = jnp.sum(normal * light_dir, axis=-1)
    bias = jnp.maximum(0.05 * (1.0 - ndl), 0.005)

    shadow = _pcf16_at_layer(cascade_maps, cascade_matrices, layer, world, bias)
    if blend_size > 0.0 and c > 1:
        # Blend fraction: how close view_z is to this cascade's far split,
        # as a fraction of the split distance (reference blend_size, a
        # [0, 1] region near the boundary, shadow.rs:30-31).
        split = split_distances[jnp.clip(layer, 0, c - 1)]
        frac = jnp.clip(
            (view_z - split * (1.0 - blend_size))
            / jnp.maximum(split * blend_size, 1e-6),
            0.0,
            1.0,
        )
        next_layer = jnp.clip(layer + 1, 0, c - 1)
        shadow_next = _pcf16_at_layer(
            cascade_maps, cascade_matrices, next_layer, world, bias
        )
        blend = jnp.where(next_layer > layer, frac, 0.0)
        shadow = shadow * (1.0 - blend) + shadow_next * blend
    return shadow
