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
hdr_framebuffer.rs:34-96). Buffers here are (H, W, 3) float32; the chain cost
is geometric (sum ~1/3 of full res), negligible next to rasterization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LUMA = jnp.asarray([0.2126, 0.7152, 0.0722])


def bilinear_clamp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (H, W, C) at normalized (u, v), CLAMP_TO_EDGE."""
    h, w = img.shape[:2]
    px = u * w - 0.5
    py = v * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    def at(xi, yi):
        return img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]

    top = at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx
    bot = at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _target_uv(h: int, w: int):
    u = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    v = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
    return u, v


def soft_threshold(color: jnp.ndarray, threshold: float, soft_knee: float) -> jnp.ndarray:
    """bloom_threshold.frag:17-26."""
    brightness = jnp.max(color, axis=-1, keepdims=True)
    soft = brightness - threshold + soft_knee
    soft = jnp.clip(soft, 0.0, 2.0 * soft_knee)
    soft = soft * soft / (4.0 * soft_knee + 1e-5)
    contribution = jnp.maximum(soft, brightness - threshold)
    contribution = contribution / jnp.maximum(brightness, 1e-5)
    return color * contribution


def downsample_karis(src: jnp.ndarray) -> jnp.ndarray:
    """Half-res downsample with Karis firefly suppression
    (bloom_downsample.frag:66-107)."""
    h, w = src.shape[:2]
    dh, dw = max(h // 2, 1), max(w // 2, 1)
    u, v = _target_uv(dh, dw)
    dx, dy = 1.0 / w, 1.0 / h

    offsets_weights = [
        ((0.0, 0.0), 0.25),
        ((-dx, -dy), 0.0625), ((dx, -dy), 0.0625),
        ((-dx, dy), 0.0625), ((dx, dy), 0.0625),
        ((-dx, 0.0), 0.125), ((dx, 0.0), 0.125),
        ((0.0, -dy), 0.125), ((0.0, dy), 0.125),
    ]
    acc = jnp.zeros((dh, dw, 3), jnp.float32)
    wsum = jnp.zeros((dh, dw, 1), jnp.float32)
    for (ox, oy), wgt in offsets_weights:
        s = bilinear_clamp(src, u + ox, v + oy)
        kw = 1.0 / (1.0 + jnp.sum(s * LUMA, axis=-1, keepdims=True))
        acc = acc + s * (kw * wgt)
        wsum = wsum + kw * wgt
    return acc / wsum


def upsample_tent(src: jnp.ndarray, dh: int, dw: int, intensity: float = 1.0) -> jnp.ndarray:
    """9-tap tent upsample to (dh, dw) (bloom_upsample.frag:16-40)."""
    h, w = src.shape[:2]
    u, v = _target_uv(dh, dw)
    dx, dy = 0.5 / w, 0.5 / h  # half texel of the SOURCE (frag:18)
    c = bilinear_clamp(src, u, v) * 4.0
    c = c + (
        bilinear_clamp(src, u - dx, v - dy)
        + bilinear_clamp(src, u + dx, v - dy)
        + bilinear_clamp(src, u + dx, v + dy)
        + bilinear_clamp(src, u - dx, v + dy)
    ) * 2.0
    c = c + (
        bilinear_clamp(src, u - 2 * dx, v)
        + bilinear_clamp(src, u + 2 * dx, v)
        + bilinear_clamp(src, u, v - 2 * dy)
        + bilinear_clamp(src, u, v + 2 * dy)
    )
    return c / 16.0 * intensity


def bloom_pyramid(
    hdr: jnp.ndarray,  # (H, W, 3) linear HDR
    threshold: float = 0.8,
    soft_knee: float = 0.5,
    mip_count: int = 5,
) -> jnp.ndarray:
    """Full bloom chain -> (H, W, 3) bloom buffer (intensity NOT applied —
    the tonemap composite multiplies it, tonemapping.frag:37)."""
    h, w = hdr.shape[:2]
    down = [soft_threshold(hdr, threshold, soft_knee)]
    for _ in range(mip_count):
        if min(down[-1].shape[:2]) <= 2:
            break
        down.append(downsample_karis(down[-1]))

    up = down[-1]
    for i in range(len(down) - 2, 0, -1):
        dh, dw = down[i].shape[:2]
        up = upsample_tent(up, dh, dw) + down[i]
    return upsample_tent(up, h, w)
