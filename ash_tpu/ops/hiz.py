"""Hi-Z depth pyramid — port of shaders/hiz_generate.comp.

Each level is the 2x2 MAX of the previous (max depth = furthest = most
conservative for occlusion, hiz_generate.comp:33-40). The reference binds one
compute dispatch per mip; here the whole pyramid is one fused chain of
reductions. Levels whose dimension is odd are edge-padded with depth 1.0
(background), keeping the reduction conservative.

The pyramid is stored as a list of (H_l, W_l) arrays plus a flat-packed form
(offset table) so the occlusion pass can index a runtime-selected level with
one gather — same trick as the bindless texture pool.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np

HIZ_LEVELS = 10  # reference occlusion_culling.rs:17-21


class HizPyramid(NamedTuple):
    texels: jnp.ndarray  # (TOTAL,) flat-packed depths, level-major
    table: np.ndarray  # (L, 3) STATIC int: offset, width, height
    levels: int

    def level(self, i: int) -> jnp.ndarray:
        off, w, h = self.table[i]
        return self.texels[off : off + w * h].reshape(h, w)


def _fold_odd_max(d: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Max-fold the trailing element of an odd-length axis into the last
    kept pair, so the 2x2 reduction below never DROPS it. (The previous
    `d[:ph, :pw]` truncation silently discarded the last row/col of every
    odd level >= 3 — far depths at the screen edge vanished from the
    pyramid and the occlusion test falsely culled visible objects there.)
    Floor-sized levels are kept (matching the reference's mip dims,
    hiz_generate.comp); folding beats padding because the uv->texel
    mapping of sample_level stays exact."""
    n = d.shape[axis]
    if n <= 1 or n % 2 == 0:
        return d
    import jax

    sl = [slice(None)] * d.ndim
    sl[axis] = slice(0, n - 1)
    main = d[tuple(sl)]
    sl[axis] = slice(n - 1, n)
    last = d[tuple(sl)]
    sl[axis] = slice(n - 2, n - 1)
    merged = jnp.maximum(d[tuple(sl)], last)
    return jax.lax.dynamic_update_slice_in_dim(main, merged, n - 2, axis)


def _downsample_max(d: jnp.ndarray) -> jnp.ndarray:
    d = _fold_odd_max(_fold_odd_max(d, 0), 1)
    h, w = d.shape
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    if nh * 2 > h or nw * 2 > w:  # a dimension of exactly 1
        d = jnp.pad(d, ((0, nh * 2 - h), (0, nw * 2 - w)), mode="edge")
    return d.reshape(nh, 2, nw, 2).max(axis=(1, 3))


def build_hiz(depth: jnp.ndarray, max_levels: int = HIZ_LEVELS) -> HizPyramid:
    """Full pyramid from a (H, W) depth buffer (level 0 = the buffer)."""
    mips: List[jnp.ndarray] = [depth]
    while len(mips) < max_levels and max(mips[-1].shape) > 1:
        mips.append(_downsample_max(mips[-1]))

    table = np.zeros((len(mips), 3), np.int64)
    off = 0
    for i, m in enumerate(mips):
        h, w = m.shape
        table[i] = (off, w, h)
        off += h * w
    texels = jnp.concatenate([m.reshape(-1) for m in mips])
    return HizPyramid(texels=texels, table=table, levels=len(mips))


def sample_level(pyr: HizPyramid, level: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Nearest sample at a runtime level index (textureLod in
    occlusion_cull.comp:170). level/u/v: (...,)."""
    table = jnp.asarray(pyr.table.astype(np.int32))
    entry = table[jnp.clip(level, 0, pyr.levels - 1)]
    off, w, h = entry[..., 0], entry[..., 1], entry[..., 2]
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    return pyr.texels[off + y * w + x]
