"""Bloom pyramid: soft threshold -> Karis downsample chain -> tent upsample.

Numerical port of the reference bloom shaders:
- threshold with soft knee 0.5 (shaders/bloom_threshold.frag:17-33)
- 9-sample downsample with weights 0.25 center / 0.125 edges / 0.0625
  corners, each sample Karis-weighted by 1/(1+luma) and renormalized
  (shaders/bloom_downsample.frag:66-107)
- 9-tap tent upsample /16 (shaders/bloom_upsample.frag:20-41)

Chain structure (the reference documents threshold -> progressive down ->
additive up, features/bloom.rs:35-40; its Vulkan wiring was never landed):
  down[0] = threshold(hdr) at full res
  down[i] = downsample(down[i-1])          i = 1..mips
  up[mips] = down[mips]
  up[i]   = tent(up[i+1]) + down[i]        additive blend
  bloom   = tent(up[1])                    full res; intensity applied at the
                                           tonemap composite (tonemapping.frag:37)

All sampling is bilinear with CLAMP_TO_EDGE (the HDR target sampler,
hdr_framebuffer.rs:34-96).

TPU layout + lowering notes (measured on v5e, round 2):
- The chain runs CHANNELS-FIRST internally: a (H, W, 3) array tiles its
  minor-most dims (W, 3) onto the (8, 128) vregs — 3 of 128 lanes used, so
  every pad/shift/reshape pays ~42x the traffic (one 1080p downsample
  measured 144 ms). As (3, H, W), W rides the lanes: the same tap is
  0.02 ms. moveaxis in/out costs ~0.03 ms.
- Regular-grid taps use STATIC slices, not gathers: XLA lowers the generic
  bilinear gather to per-element (1,1,C) HBM reads (~1.2 TB for one 1080p
  downsample). The 2x downsample samples at integer+0.5 source positions
  (0.5/0.5 lerps of a 2x2 block); the 2x upsample at quarter-texel
  positions with parity-fixed 0.25/0.75 fractions. The gather path remains
  only for odd-sized pyramid levels (tiny) — flat-indexed, channels-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layout import to_cf, to_cl

# numpy, NOT jnp: a module-level device array would initialize
# the JAX backend at import time (which hangs a subprocess that
# needs to pin its platform first — see render/aot_worker.py).
LUMA = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


# ---------------------------------------------------------------------------
# Channels-last public helpers (compat shims over the cf internals)
# ---------------------------------------------------------------------------


def bilinear_clamp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (H, W, C) at normalized (u, v), CLAMP_TO_EDGE."""
    return to_cl(_bilinear_clamp_cf(to_cf(img), u, v))


def shift_clamp(img: jnp.ndarray, oy: int, ox: int) -> jnp.ndarray:
    """img shifted by integer (oy, ox) texels with CLAMP_TO_EDGE — static
    slices (equivalent to bilinear_clamp at exact integer offsets, without
    the gather or its float-roundtrip index wobble). Channel-position
    agnostic: shifts the first two dims of an (H, W, ...) array."""
    h, w = img.shape[:2]
    pt, pb = max(-oy, 0), max(oy, 0)
    pl, pr = max(-ox, 0), max(ox, 0)
    p = jnp.pad(img, ((pt, pb), (pl, pr)) + ((0, 0),) * (img.ndim - 2),
                mode="edge")
    return p[pb:pb + h, pr:pr + w]


def _target_uv(h: int, w: int):
    u = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    v = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
    return u, v


# ---------------------------------------------------------------------------
# Channels-first internals
# ---------------------------------------------------------------------------


def _bilinear_clamp_cf(img: jnp.ndarray, u, v) -> jnp.ndarray:
    """Bilinear sample of (C, H, W) at normalized (u, v) grids — flat
    1D-indexed gathers (the only formulation XLA lowers acceptably)."""
    c, h, w = img.shape
    px = u * w - 0.5
    py = v * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0
    flat = img.reshape(c, h * w)

    def at(xi, yi):
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        return flat[:, idx]  # (C, *idx.shape)

    top = at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx
    bot = at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _down_tap_cf(src: jnp.ndarray, oy: int, ox: int) -> jnp.ndarray:
    """Even-size downsample tap on (C, H, W): bilinear at
    (2x+0.5+ox, 2y+0.5+oy) with edge clamp = 0.5/0.5 lerps over an
    (offset) 2x2 source block. Lerp at full res (cheap elementwise), one
    parity decimation at the end — no strided lane slicing."""
    ch, h, w = src.shape
    # Pad 2 on the high side: the pre-decimation full-res lerp touches
    # index h+2 in discarded (parity-1) positions only.
    p = jnp.pad(src, ((0, 0), (1, 2), (1, 2)), mode="edge")

    def sh(r0, c0):  # src[2y + r0 - 1, 2x + c0 - 1] pre-decimation
        return p[:, r0:r0 + h, c0:c0 + w]

    a = sh(oy + 1, ox + 1)
    b = sh(oy + 1, ox + 2)
    c = sh(oy + 2, ox + 1)
    d = sh(oy + 2, ox + 2)
    m = (a * 0.5 + b * 0.5) * 0.5 + (c * 0.5 + d * 0.5) * 0.5
    # Stride-2 parity decimation: same runtime as the reshape-select form
    # but ~20x cheaper to COMPILE (the split-dims reshape at e.g.
    # (3, 540, 960) cost 15 s of XLA compile per tap-site, both backends).
    return m[:, ::2, ::2]


# Per-parity (x0 shift, fx) of a 2x-upsample axis lerp, by tap offset in
# HALF-source-texels: target px = t/2 - 0.25 + m/2  (t even | t odd).
_UP_TAB = {
    0: ((-1, 0.75), (0, 0.25)),
    1: ((0, 0.25), (0, 0.75)),
    -1: ((-1, 0.25), (-1, 0.75)),
    2: ((0, 0.75), (1, 0.25)),
    -2: ((-2, 0.75), (-1, 0.25)),
}


def _axis_up2_cf(img: jnp.ndarray, m: int, axis: int) -> jnp.ndarray:
    """Double `axis` of a (C, H, W) array by the parity-fixed bilinear lerp
    at half-texel offset m/2 (edge clamped)."""
    n = img.shape[axis]
    pads = [(0, 0)] * img.ndim
    pads[axis] = (2, 2)
    q = jnp.pad(img, pads, mode="edge")

    def sl(s):
        idx = [slice(None)] * img.ndim
        idx[axis] = slice(s + 2, s + 2 + n)
        return q[tuple(idx)]

    outs = [sl(s) * (1.0 - f) + sl(s + 1) * f for s, f in _UP_TAB[m]]
    inter = jnp.stack(outs, axis=axis + 1)  # (.., n, 2, ..)
    shape = list(img.shape)
    shape[axis] = 2 * n
    return inter.reshape(shape)


def _up_tap_cf(src: jnp.ndarray, my: int, mx: int) -> jnp.ndarray:
    """Even-size upsample tap on (C, H, W): bilinear on the 2x target grid
    at a (my, mx) half-source-texel offset — separable parity lerps."""
    return _axis_up2_cf(_axis_up2_cf(src, mx, axis=2), my, axis=1)


_DOWN_TAPS = [
    ((0, 0), 0.25),
    ((-1, -1), 0.0625), ((1, -1), 0.0625),
    ((-1, 1), 0.0625), ((1, 1), 0.0625),
    ((-1, 0), 0.125), ((1, 0), 0.125),
    ((0, -1), 0.125), ((0, 1), 0.125),
]


def _downsample_karis_cf(src: jnp.ndarray) -> jnp.ndarray:
    h, w = src.shape[1:]
    dh, dw = max(h // 2, 1), max(w // 2, 1)
    fast = h % 2 == 0 and w % 2 == 0 and h >= 2 and w >= 2
    if not fast:
        u, v = _target_uv(dh, dw)
        dx, dy = 1.0 / w, 1.0 / h
    # PLANAR cross-channel math: reductions/broadcasts along the channel
    # axis of a (3, H, W) array cost ~6 ms each at 1080p on TPU (measured);
    # explicit plane slices + a major-axis stack cost ~0.
    accs = [jnp.float32(0.0)] * 3
    wsum = jnp.float32(0.0)
    for (ox, oy), wgt in _DOWN_TAPS:
        if fast:
            s = _down_tap_cf(src, oy, ox)
        else:
            s = _bilinear_clamp_cf(src, u + ox * dx, v + oy * dy)
        r, g, b = s[0], s[1], s[2]
        kw = wgt / (1.0 + (0.2126 * r + 0.7152 * g + 0.0722 * b))
        accs = [accs[0] + r * kw, accs[1] + g * kw, accs[2] + b * kw]
        wsum = wsum + kw
    return jnp.stack([a / wsum for a in accs])


def _upsample_tent_cf(src: jnp.ndarray, dh: int, dw: int,
                      intensity: float = 1.0) -> jnp.ndarray:
    ch, h, w = src.shape
    if dh == 2 * h and dw == 2 * w:
        c = _up_tap_cf(src, 0, 0) * 4.0
        c = c + (
            _up_tap_cf(src, -1, -1)
            + _up_tap_cf(src, -1, 1)
            + _up_tap_cf(src, 1, 1)
            + _up_tap_cf(src, 1, -1)
        ) * 2.0
        c = c + (
            _up_tap_cf(src, 0, -2)
            + _up_tap_cf(src, 0, 2)
            + _up_tap_cf(src, -2, 0)
            + _up_tap_cf(src, 2, 0)
        )
        return c / 16.0 * intensity
    u, v = _target_uv(dh, dw)
    dx, dy = 0.5 / w, 0.5 / h  # half texel of the SOURCE (frag:18)
    c = _bilinear_clamp_cf(src, u, v) * 4.0
    c = c + (
        _bilinear_clamp_cf(src, u - dx, v - dy)
        + _bilinear_clamp_cf(src, u + dx, v - dy)
        + _bilinear_clamp_cf(src, u + dx, v + dy)
        + _bilinear_clamp_cf(src, u - dx, v + dy)
    ) * 2.0
    c = c + (
        _bilinear_clamp_cf(src, u - 2 * dx, v)
        + _bilinear_clamp_cf(src, u + 2 * dx, v)
        + _bilinear_clamp_cf(src, u, v - 2 * dy)
        + _bilinear_clamp_cf(src, u, v + 2 * dy)
    )
    return c / 16.0 * intensity


def _soft_threshold_cf(color: jnp.ndarray, threshold, soft_knee) -> jnp.ndarray:
    r, g, b = color[0], color[1], color[2]  # planar (see downsample note)
    brightness = jnp.maximum(r, jnp.maximum(g, b))
    soft = brightness - threshold + soft_knee
    soft = jnp.clip(soft, 0.0, 2.0 * soft_knee)
    soft = soft * soft / (4.0 * soft_knee + 1e-5)
    contribution = jnp.maximum(soft, brightness - threshold)
    contribution = contribution / jnp.maximum(brightness, 1e-5)
    return jnp.stack([r * contribution, g * contribution, b * contribution])


# ---------------------------------------------------------------------------
# Public channels-last API
# ---------------------------------------------------------------------------


def soft_threshold(color: jnp.ndarray, threshold: float, soft_knee: float) -> jnp.ndarray:
    """bloom_threshold.frag:17-26. (H, W, 3) in/out."""
    brightness = jnp.max(color, axis=-1, keepdims=True)
    soft = brightness - threshold + soft_knee
    soft = jnp.clip(soft, 0.0, 2.0 * soft_knee)
    soft = soft * soft / (4.0 * soft_knee + 1e-5)
    contribution = jnp.maximum(soft, brightness - threshold)
    contribution = contribution / jnp.maximum(brightness, 1e-5)
    return color * contribution


def downsample_karis(src: jnp.ndarray) -> jnp.ndarray:
    """Half-res downsample with Karis firefly suppression
    (bloom_downsample.frag:66-107). (H, W, 3) in/out."""
    return to_cl(_downsample_karis_cf(to_cf(src)))


def upsample_tent(src: jnp.ndarray, dh: int, dw: int, intensity: float = 1.0) -> jnp.ndarray:
    """9-tap tent upsample to (dh, dw) (bloom_upsample.frag:16-40).
    (H, W, 3) in/out."""
    return to_cl(_upsample_tent_cf(to_cf(src), dh, dw, intensity))


def bloom_pyramid(
    hdr: jnp.ndarray,  # (H, W, 3) linear HDR
    threshold: float = 0.8,
    soft_knee: float = 0.5,
    mip_count: int = 5,
) -> jnp.ndarray:
    """Full bloom chain -> (H, W, 3) bloom buffer (intensity NOT applied —
    the tonemap composite multiplies it, tonemapping.frag:37). One
    channels-first round trip for the whole chain."""
    x = to_cf(hdr)  # (3, H, W)
    h, w = x.shape[1:]
    down = [_soft_threshold_cf(x, threshold, soft_knee)]
    for _ in range(mip_count):
        if min(down[-1].shape[1:]) <= 2:
            break
        down.append(_downsample_karis_cf(down[-1]))

    up = down[-1]
    for i in range(len(down) - 2, 0, -1):
        dh, dw = down[i].shape[1:]
        up = _upsample_tent_cf(up, dh, dw) + down[i]
    return to_cl(_upsample_tent_cf(up, h, w))
