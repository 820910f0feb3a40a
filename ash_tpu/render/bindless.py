"""Bindless texture manager — host side of the flat texture pool.

TPU-native re-design of the reference BindlessManager
(src/vulkan/descriptor_bindless.rs): `add_sampled_image` returns a
monotonically increasing index with NO recycling (descriptor_bindless.rs:
115-124); default capacity 4096 (renderer.rs:508-512). Instead of descriptor
writes, registration records the CPU mip pyramid; `build()` packs everything
into the flat device pool consumed by ops/texture_sample.py.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.texture import TextureData, mip_chain
from ..errors import ResourceCreationError
from ..ops.texture_sample import TexturePool, build_pool

DEFAULT_CAPACITY = 4096  # reference renderer.rs:508-512
MAX_BINDLESS_RESOURCES = 128 * 1024  # reference descriptor_allocator.rs:11


class BindlessTextureManager:
    """Monotonic texture registry -> flat device pool."""

    def __init__(self, capacity: int = DEFAULT_CAPACITY):
        if capacity > MAX_BINDLESS_RESOURCES:
            raise ResourceCreationError(
                f"capacity {capacity} exceeds pool max {MAX_BINDLESS_RESOURCES}"
            )
        self.capacity = capacity
        self._pyramids: List[List[np.ndarray]] = []
        self._pool: Optional[TexturePool] = None
        self._dirty = True

    def __len__(self) -> int:
        return len(self._pyramids)

    def add_sampled_image(self, data: TextureData) -> int:
        """Register a texture; returns its bindless index (never recycled)."""
        if len(self._pyramids) >= self.capacity:
            raise ResourceCreationError(
                f"bindless pool full ({self.capacity} textures)"
            )
        idx = len(self._pyramids)
        self._pyramids.append(mip_chain(None, data.to_linear_f32()))
        self._dirty = True
        return idx

    def pool(self) -> Optional[TexturePool]:
        """Build (or fetch cached) device pool; None if no textures."""
        if not self._pyramids:
            return None
        if self._dirty or self._pool is None:
            self._pool = build_pool(self._pyramids)
            self._dirty = False
        return self._pool

    def stats(self) -> dict:
        texels = sum(
            int(m.shape[0] * m.shape[1]) for p in self._pyramids for m in p
        )
        return {
            "textures": len(self._pyramids),
            "capacity": self.capacity,
            "texels": texels,
            "bytes": texels * 8,  # bfloat16 RGBA
        }
