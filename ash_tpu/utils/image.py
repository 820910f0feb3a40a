"""Image IO + quality metrics (PSNR for golden-frame parity tests)."""

from __future__ import annotations

import numpy as np


def to_u8(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with round-to-nearest (matches UNORM stores)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return np.clip(np.asarray(img, np.float32) * 255.0 + 0.5, 0, 255).astype(
        np.uint8
    )


def write_png(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3|4) image (uint8 or float [0,1]) to a PNG file."""
    from PIL import Image

    arr = to_u8(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    Image.fromarray(arr).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB. Inputs float or uint8 (same scale)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.max() > 2.0 or b.max() > 2.0:  # uint8-scaled inputs
        peak = 255.0
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))
