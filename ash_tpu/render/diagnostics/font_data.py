"""Embedded 8x8 bitmap font for the diagnostics overlay.

The reference embeds a hand-drawn 8x8 ASCII font (chars 32-126,
src/renderer/diagnostics/font_data.rs). We generate an equivalent 8x8 atlas
once at import time by rasterizing PIL's built-in bitmap font — same coverage
(ASCII 32..126), same per-glyph layout (row-major 8x8 bitmask).
"""

from __future__ import annotations

import numpy as np

FIRST_CHAR = 32
LAST_CHAR = 126
GLYPH_SIZE = 8


def _build_font() -> np.ndarray:
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    glyphs = np.zeros(
        (LAST_CHAR - FIRST_CHAR + 1, GLYPH_SIZE, GLYPH_SIZE), np.uint8
    )
    for code in range(FIRST_CHAR, LAST_CHAR + 1):
        img = Image.new("L", (GLYPH_SIZE, GLYPH_SIZE), 0)
        ImageDraw.Draw(img).text((0, -2), chr(code), fill=255, font=font)
        glyphs[code - FIRST_CHAR] = (np.asarray(img) > 128).astype(np.uint8)
    return glyphs


FONT_8X8: np.ndarray = _build_font()  # (95, 8, 8) 0/1 masks


def glyph(char: str) -> np.ndarray:
    """8x8 bitmask for a character (unknown chars render as space)."""
    code = ord(char[0])
    if FIRST_CHAR <= code <= LAST_CHAR:
        return FONT_8X8[code - FIRST_CHAR]
    return FONT_8X8[0]
