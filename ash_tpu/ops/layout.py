"""Image layout helpers: channels-first compute with pinned layouts.

On TPU an (H, W, C<=4) image tiles its minor-most dims (W, C) onto the
(8, 128) vector registers — C of 128 lanes used, so every pad / shift /
reshape / transcendental over the image pays ~128/C x the traffic. One
1080p bloom downsample measured 144 ms channels-last vs 0.03 ms
channels-first; an ACES tonemap composite 5 ms vs 0.03 ms.

Transposing at the op boundary is NOT enough: XLA fuses the transpose into
the consumer loop, which then runs in the original (bad) layout. The
`optimization_barrier` in to_cf/to_cl forces the relayout to materialize
(a standalone 1080p transpose costs ~0.02 ms), so the compute between the
conversions actually runs channels-first.

Also avoid cross-channel REDUCTIONS on (C, H, W) (jnp.sum/max over axis 0
measured ~6 ms at 1080p): slice the planes (x[0], x[1], x[2]) and combine
with explicit arithmetic + jnp.stack along axis 0 instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_cf(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (C, H, W), materialized in the lane-friendly layout."""
    return jax.lax.optimization_barrier(jnp.moveaxis(img, -1, 0))


def to_cl(img: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) -> (H, W, C); the cf value is pinned so upstream compute
    stays channels-first, the transpose itself may fuse downstream."""
    return jnp.moveaxis(jax.lax.optimization_barrier(img), 0, -1)
