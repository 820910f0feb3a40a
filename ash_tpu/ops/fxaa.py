"""FXAA — fast approximate antialiasing on the tonemapped LDR image.

The reference's PostProcessingConfig carries an `enable_fxaa` flag
(features/post_processing.rs:4-22) with no shader behind it; this is the
implementation. A console-style single-pass FXAA: luma edge detection with
absolute + relative contrast thresholds, then a blend toward the 3x3
tent-filtered neighborhood proportional to sub-pixel contrast, clamped by
edge orientation. Runs after tonemap/gamma (LDR), matching standard FXAA
placement.
"""

from __future__ import annotations

import jax.numpy as jnp

LUMA = jnp.asarray([0.299, 0.587, 0.114])

EDGE_THRESHOLD = 1.0 / 8.0  # relative contrast threshold
EDGE_THRESHOLD_MIN = 1.0 / 24.0  # absolute floor
SUBPIX_STRENGTH = 0.75


def _shift(img, dy, dx):
    """Edge-clamped neighbor fetch."""
    h, w = img.shape[:2]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def fxaa(color: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) LDR in, antialiased (H, W, 3) out."""
    luma = jnp.einsum("hwc,c->hw", color, LUMA)

    l_n = _shift(luma, -1, 0)
    l_s = _shift(luma, 1, 0)
    l_e = _shift(luma, 0, 1)
    l_w = _shift(luma, 0, -1)
    l_ne = _shift(luma, -1, 1)
    l_nw = _shift(luma, -1, -1)
    l_se = _shift(luma, 1, 1)
    l_sw = _shift(luma, 1, -1)

    l_min = jnp.minimum(
        luma, jnp.minimum(jnp.minimum(l_n, l_s), jnp.minimum(l_e, l_w))
    )
    l_max = jnp.maximum(
        luma, jnp.maximum(jnp.maximum(l_n, l_s), jnp.maximum(l_e, l_w))
    )
    contrast = l_max - l_min
    threshold = jnp.maximum(EDGE_THRESHOLD_MIN, l_max * EDGE_THRESHOLD)
    is_edge = contrast >= threshold

    # Sub-pixel blend amount: how far the center deviates from the local
    # lowpass, normalized by contrast.
    lowpass = (l_n + l_s + l_e + l_w) * 0.25
    range_l = jnp.abs(lowpass - luma)
    blend = jnp.clip(range_l / jnp.maximum(contrast, 1e-6), 0.0, 1.0)
    blend = (blend * blend) * SUBPIX_STRENGTH

    # 3x3 tent-filtered color (the "blurred" candidate).
    def t(img):
        c = img * 4.0
        c = c + (_shift(img, -1, 0) + _shift(img, 1, 0)
                 + _shift(img, 0, 1) + _shift(img, 0, -1)) * 2.0
        c = c + (_shift(img, -1, -1) + _shift(img, -1, 1)
                 + _shift(img, 1, -1) + _shift(img, 1, 1))
        return c / 16.0

    blurred = t(color)
    amount = jnp.where(is_edge, blend, 0.0)[..., None]
    return color * (1.0 - amount) + blurred * amount
