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


def _downsample_max(d: jnp.ndarray) -> jnp.ndarray:
    h, w = d.shape
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    ph, pw = nh * 2, nw * 2
    if h < ph or w < pw:
        d = jnp.pad(d, ((0, ph - h), (0, pw - w)), constant_values=1.0)
    d = d[:ph, :pw]
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
