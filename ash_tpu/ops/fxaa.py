"""FXAA — fast approximate antialiasing on the tonemapped LDR image.

The reference's PostProcessingConfig carries an `enable_fxaa` flag
(features/post_processing.rs:4-22) with no shader behind it; this is the
implementation. A console-style single-pass FXAA: luma edge detection with
absolute + relative contrast thresholds, then a blend toward the 3x3
tent-filtered neighborhood proportional to sub-pixel contrast, clamped by
edge orientation. Runs after tonemap/gamma (LDR), matching standard FXAA
placement.

TPU layout note: planar internally (per-channel (H, W) planes, shifts as
edge-padded static slices) — gather-based shifts and channel-axis
reductions on (H, W, 3) cost milliseconds at 1080p (see ops/bloom.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .layout import to_cf, to_cl

# numpy, NOT jnp: a module-level device array would initialize
# the JAX backend at import time (which hangs a subprocess that
# needs to pin its platform first — see render/aot_worker.py).
LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)

EDGE_THRESHOLD = 1.0 / 8.0  # relative contrast threshold
EDGE_THRESHOLD_MIN = 1.0 / 24.0  # absolute floor
SUBPIX_STRENGTH = 0.75


def _shift(img, dy, dx):
    """Edge-clamped neighbor fetch of an (H, W) plane — static slices."""
    h, w = img.shape[:2]
    pt, pb = max(-dy, 0), max(dy, 0)
    pl, pr = max(-dx, 0), max(dx, 0)
    p = jnp.pad(img, ((pt, pb), (pl, pr)), mode="edge")
    return p[pb:pb + h, pr:pr + w]


def fxaa(color: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) LDR in, antialiased (H, W, 3) out."""
    cf = to_cf(color)
    r, g, b = cf[0], cf[1], cf[2]
    luma = 0.299 * r + 0.587 * g + 0.114 * b

    l_n = _shift(luma, -1, 0)
    l_s = _shift(luma, 1, 0)
    l_e = _shift(luma, 0, 1)
    l_w = _shift(luma, 0, -1)

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

    # 3x3 tent-filtered color (the "blurred" candidate), per plane.
    def t(p):
        c = p * 4.0
        c = c + (_shift(p, -1, 0) + _shift(p, 1, 0)
                 + _shift(p, 0, 1) + _shift(p, 0, -1)) * 2.0
        c = c + (_shift(p, -1, -1) + _shift(p, -1, 1)
                 + _shift(p, 1, -1) + _shift(p, 1, 1))
        return c / 16.0

    amount = jnp.where(is_edge, blend, 0.0)
    planes = [
        p * (1.0 - amount) + t(p) * amount for p in (r, g, b)
    ]
    return to_cl(jnp.stack(planes, axis=0))