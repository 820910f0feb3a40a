"""Bindless texture pool + trilinear sampling.

TPU-native replacement for the reference's bindless descriptor array
(src/vulkan/descriptor_bindless.rs + `sampler2D textures[]` in
shaders/frag.frag:42). All registered textures live in ONE flat HBM array of
texels; a per-texture mip table stores (offset, width, height) per level. A
"texture handle" is just an int32 index into the table — the same contract as
the reference's bindless indices, including -1 = "no texture -> white"
(frag.frag:125-127).

Sampling implements the reference sampler state (texture.rs:313-327): REPEAT
addressing, bilinear min/mag, LINEAR mipmap (trilinear). Anisotropic
filtering (16x in the reference) is implemented in ops/shade.py
(footprint-assembly multi-tap along the major-axis footprint) and enabled
via FrameConfig.max_anisotropy, which DEFAULTS to 16 — the reference
sampler's setting. Runtime is free (measured on the chip, 1080p textured
scene, 201 draws: 0.43 ms at aniso=16 vs 0.47 ms at aniso=1 — the taps
fuse into the shade pass, which has VPU headroom), and since the tap loop
became a dynamic-trip `lax.while_loop` bounded by max(n_taps) over the
image, trace+compile cost is constant in tap count too (the earlier
UNROLLED 16-tap sampler cost ~200 s cold / ~32 s warm-cache; the loop
form compiles as fast as aniso=1, and head-on frames execute one tap).
tests/golden/textured pins the 16x look; set max_anisotropy=1 for plain
trilinear.

Each bilinear fetch is 4 dynamic gathers from the flat texel array; trilinear
is 8. Gathers vectorize over all pixels at once.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class TexturePool(NamedTuple):
    """Flat bindless texture storage (device arrays).

    Texels are stored bfloat16: the sources are 8-bit sRGB images, so bf16's
    8-bit mantissa loses nothing that the source had, and it halves HBM
    footprint + gather bandwidth. Filtering happens in float32.

    `min_level` implements MIP RESIDENCY for the streaming pool
    (render/bindless.py): levels below a texture's min_level are not in
    HBM, and sampling clamps its LOD up to the finest resident level. A
    restream (changed residency) rewrites texel/table VALUES but never the
    shapes, so frame programs are not re-traced.
    """

    texels: jnp.ndarray  # (TOTAL, 4) bfloat16 linear RGBA
    table: jnp.ndarray  # (N, MAX_MIPS, 3) int32: offset, width, height
    levels: jnp.ndarray  # (N,) int32 mip count
    min_level: Optional[jnp.ndarray] = None  # (N,) int32 finest resident

    @property
    def num_textures(self) -> int:
        return int(self.table.shape[0])


def build_pool(
    mip_pyramids: list[list[np.ndarray]],
    min_levels: Optional[Sequence[int]] = None,
    arena_texels: Optional[int] = None,
) -> TexturePool:
    """Pack per-texture mip pyramids ((H,W,4) float32 each) into a pool.

    `min_levels[i]` (streaming residency) skips levels < it for texture i —
    only resident mips occupy HBM. `arena_texels` pads/fixes the texel
    array length so restreams keep a stable shape (no frame re-trace);
    resident texels must fit or this raises.
    """
    if not mip_pyramids:
        # Single white 1x1 placeholder so shapes stay static.
        mip_pyramids = [[np.ones((1, 1, 4), np.float32)]]
    if min_levels is None:
        min_levels = [0] * len(mip_pyramids)
    max_mips = max(len(p) for p in mip_pyramids)
    texel_rows = []
    table = np.zeros((len(mip_pyramids), max_mips, 3), np.int64)
    levels = np.zeros(len(mip_pyramids), np.int32)
    mins = np.zeros(len(mip_pyramids), np.int32)
    offset = 0
    for ti, pyramid in enumerate(mip_pyramids):
        levels[ti] = len(pyramid)
        lo = int(min(min_levels[ti], len(pyramid) - 1))
        mins[ti] = lo
        for li, mip in enumerate(pyramid):
            if li < lo:
                continue  # non-resident: sampling clamps past it
            h, w = mip.shape[:2]
            table[ti, li] = (offset, w, h)
            texel_rows.append(mip.reshape(-1, 4).astype(np.float32))
            offset += h * w
        # Skipped (non-resident) levels: offset redirects to the finest
        # resident mip (defensive — sample_trilinear clamps LOD to
        # min_level, so these rows are never fetched), but their (w, h)
        # stay the TRUE level dims: ops/shade._sample_map computes the
        # screen footprint from table[idx, 0], and redirected dims made
        # the LOD come out min_level levels too fine on every streamed
        # texture (aliasing that silently worsened as residency dropped).
        for li in range(lo):
            h, w = pyramid[li].shape[:2]
            table[ti, li] = (table[ti, lo][0], w, h)
    texels = np.concatenate(texel_rows, axis=0)
    if arena_texels is not None:
        if offset > arena_texels:
            raise ValueError(
                f"resident texels {offset} exceed arena {arena_texels}"
            )
        texels = np.concatenate(
            [texels, np.zeros((arena_texels - offset, 4), np.float32)]
        )
    # Streaming pools (arena mode) ALWAYS carry min_level so the pytree
    # structure — and therefore the jit cache key — is restream-invariant.
    keep_min = arena_texels is not None or bool(np.any(mins > 0))
    return TexturePool(
        texels=jnp.asarray(texels, dtype=jnp.bfloat16),
        table=jnp.asarray(table.astype(np.int32)),
        levels=jnp.asarray(levels),
        min_level=jnp.asarray(mins) if keep_min else None,
    )


def _bilinear_at_level(pool: TexturePool, idx, level, u, v):
    """Bilinear fetch at an integer mip level. idx/level/u/v: (...,)."""
    entry = pool.table[idx, level]  # (..., 3)
    off, w, h = entry[..., 0], entry[..., 1], entry[..., 2]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    px = u * wf - 0.5
    py = v * hf - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0.astype(jnp.float32))[..., None]

    def fetch(xi, yi):
        # REPEAT addressing (texture.rs sampler REPEAT).
        xw = jnp.where(w > 0, jnp.mod(xi, jnp.maximum(w, 1)), 0)
        yw = jnp.where(h > 0, jnp.mod(yi, jnp.maximum(h, 1)), 0)
        flat = off + yw * w + xw
        return pool.texels[jnp.clip(flat, 0, pool.texels.shape[0] - 1)].astype(
            jnp.float32
        )

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_trilinear(
    pool: TexturePool,
    idx: jnp.ndarray,  # (...,) int32 texture index, -1 => white
    uv: jnp.ndarray,  # (..., 2)
    lod: jnp.ndarray | None = None,  # (...,) float32 mip level; None => 0
) -> jnp.ndarray:
    """Sample with REPEAT + trilinear filtering. Returns (..., 4)."""
    safe_idx = jnp.maximum(idx, 0)
    u = uv[..., 0]
    v = uv[..., 1]
    max_level = (pool.levels[safe_idx] - 1).astype(jnp.float32)
    if lod is None:
        lod = jnp.zeros_like(u)
    # Mip residency: LOD can't go finer than the finest RESIDENT level
    # (streaming pool under an HBM budget — render/bindless.py).
    floor_level = (
        pool.min_level[safe_idx].astype(jnp.float32)
        if pool.min_level is not None
        else 0.0
    )
    lod = jnp.clip(lod, floor_level, max_level)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, pool.levels[safe_idx] - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]
    c0 = _bilinear_at_level(pool, safe_idx, l0, u, v)
    c1 = _bilinear_at_level(pool, safe_idx, l1, u, v)
    color = c0 * (1 - f) + c1 * f
    return jnp.where((idx >= 0)[..., None], color, jnp.ones_like(color))
