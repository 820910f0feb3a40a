"""Diagnostics text overlay.

Port of the reference overlay stack (src/renderer/diagnostics/overlay.rs,
overlay_types.rs, overlay_pipeline.rs): stats lines + a background quad drawn
with the embedded 8x8 font. The reference generates TextVertex quads and
draws them with an alpha-blend pipeline over the swapchain image
(overlay_pipeline.rs:20-70); here the text rasterizes host-side into a small
RGBA patch (text only — tiny), and a jitted composite alpha-blends it onto
the presented frame.

Defaults match OverlayConfig (overlay_types.rs:62-95): scale 2, green text on
a translucent black background, 8px margin.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import numpy as np

from .font_data import GLYPH_SIZE, glyph


class TextVertex(NamedTuple):
    """Overlay vertex (reference overlay_types.rs `TextVertex{pos,uv,color}`)."""

    pos: Tuple[float, float]
    uv: Tuple[float, float]
    color: Tuple[float, float, float, float]


@dataclasses.dataclass
class OverlayConfig:
    """overlay_types.rs:62-95."""

    scale: int = 2
    text_color: Tuple[float, float, float, float] = (0.0, 1.0, 0.0, 1.0)
    background_color: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.6)
    margin: int = 8
    line_spacing: int = 2


def pixel_to_ndc(x: float, y: float, width: int, height: int):
    """overlay_types helper: pixel -> NDC (y down)."""
    return (x / width * 2.0 - 1.0, y / height * 2.0 - 1.0)


def generate_quad_ndc(x: float, y: float, w: float, h: float,
                      width: int, height: int, color, uv=(0, 0, 1, 1)):
    """Two-triangle quad as TextVertex tuples (pos, uv, color) in NDC
    (reference overlay_types.rs quad helper). Kept for API parity with
    consumers that build their own overlay geometry."""
    x0, y0 = pixel_to_ndc(x, y, width, height)
    x1, y1 = pixel_to_ndc(x + w, y + h, width, height)
    u0, v0, u1, v1 = uv
    c = tuple(color)
    return [
        TextVertex((x0, y0), (u0, v0), c),
        TextVertex((x1, y0), (u1, v0), c),
        TextVertex((x1, y1), (u1, v1), c),
        TextVertex((x0, y0), (u0, v0), c),
        TextVertex((x1, y1), (u1, v1), c),
        TextVertex((x0, y1), (u0, v1), c),
    ]


def render_text_patch(lines: List[str], config: OverlayConfig) -> np.ndarray:
    """Rasterize text lines to an RGBA float patch (H, W, 4)."""
    if not lines:
        return np.zeros((1, 1, 4), np.float32)
    s = config.scale
    g = GLYPH_SIZE * s
    line_h = g + config.line_spacing * s
    width = max(len(ln) for ln in lines) * g + 2 * config.margin
    height = len(lines) * line_h + 2 * config.margin

    patch = np.zeros((height, width, 4), np.float32)
    patch[:] = np.asarray(config.background_color, np.float32)

    text = np.asarray(config.text_color, np.float32)
    for li, line in enumerate(lines):
        y0 = config.margin + li * line_h
        for ci, ch in enumerate(line):
            mask = glyph(ch)
            if s != 1:
                mask = np.repeat(np.repeat(mask, s, 0), s, 1)
            x0 = config.margin + ci * g
            region = patch[y0 : y0 + g, x0 : x0 + g]
            m = mask[..., None].astype(np.float32)
            region[:] = region * (1 - m) + text * m
    return patch


class DiagnosticsOverlay:
    """Builds the overlay patch and composites it (overlay.rs:54-120)."""

    def __init__(self, config: OverlayConfig | None = None):
        self.config = config or OverlayConfig()
        self._cache_key = None
        self._cache_patch = None

    def patch(self, lines: List[str]) -> np.ndarray:
        key = tuple(lines)
        if key != self._cache_key:
            self._cache_patch = render_text_patch(lines, self.config)
            self._cache_key = key
        return self._cache_patch

    def composite(self, image_u8, lines: List[str]):
        """Alpha-blend the overlay onto a presented (H, W, 4) u8 frame."""
        import jax.numpy as jnp

        patch = self.patch(lines)
        ph, pw = patch.shape[:2]
        h, w = image_u8.shape[:2]
        ph, pw = min(ph, h), min(pw, w)
        patch = jnp.asarray(patch[:ph, :pw])
        region = image_u8[:ph, :pw, :3].astype(jnp.float32) / 255.0
        a = patch[..., 3:4]
        blended = region * (1 - a) + patch[..., :3] * a
        out_u8 = jnp.clip(blended * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        image = image_u8.at[:ph, :pw, :3].set(out_u8)
        return image
