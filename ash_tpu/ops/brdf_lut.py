"""Split-sum environment BRDF LUT — port of shaders/brdf_lut.frag.

Generates the (NdotV, roughness) -> (scale, bias) integration table used by
split-sum image-based lighting: Hammersley sequence + GGX importance
sampling, 1024 samples per texel (brdf_lut.frag:15-112). Like the reference
(which ships the shader with no in-code consumer — IBL groundwork,
SURVEY §2.3), the LUT is provided for applications to consume.

Fully vectorized: all texels x all samples at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SAMPLE_COUNT = 1024


def _hammersley(n: int) -> jnp.ndarray:
    """(n, 2) low-discrepancy points (van der Corput radical inverse)."""
    i = jnp.arange(n, dtype=jnp.uint32)
    u32 = lambda x: jnp.uint32(x)  # noqa: E731
    bits = i
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & u32(0x55555555)) << 1) | ((bits & u32(0xAAAAAAAA)) >> 1)
    bits = ((bits & u32(0x33333333)) << 2) | ((bits & u32(0xCCCCCCCC)) >> 2)
    bits = ((bits & u32(0x0F0F0F0F)) << 4) | ((bits & u32(0xF0F0F0F0)) >> 4)
    bits = ((bits & u32(0x00FF00FF)) << 8) | ((bits & u32(0xFF00FF00)) >> 8)
    radical = bits.astype(jnp.float32) * 2.3283064365386963e-10
    return jnp.stack([i.astype(jnp.float32) / n, radical], axis=-1)


def integrate_brdf(ndotv, roughness, samples: int = SAMPLE_COUNT):
    """(scale, bias) for NdotV/roughness arrays of any (matching) shape.

    Exact port of IntegrateBRDF (brdf_lut.frag:71-105): N = +Z, GGX
    importance sampling with a = roughness^2, Smith geometry with the IBL
    remap k = roughness^2 / 2 (brdf_lut.frag:52-58), L normalized.
    """
    shape = jnp.broadcast_shapes(jnp.shape(ndotv), jnp.shape(roughness))
    nv = jnp.broadcast_to(jnp.asarray(ndotv, jnp.float32), shape).reshape(-1, 1)
    rough = jnp.broadcast_to(
        jnp.asarray(roughness, jnp.float32), shape
    ).reshape(-1, 1)  # (P, 1)
    nv = jnp.maximum(nv, 1e-4)

    xi = _hammersley(samples)  # (S, 2)
    a = rough * rough  # (P, 1)
    phi = 2.0 * jnp.pi * xi[None, :, 0]  # (1, S)
    cos_t = jnp.sqrt(
        (1.0 - xi[None, :, 1])
        / (1.0 + (a * a - 1.0)[..., 0:1] * xi[None, :, 1])
    )  # (P, S)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    hx = jnp.cos(phi) * sin_t
    hy = jnp.sin(phi) * sin_t
    hz = cos_t  # N = +Z so tangent frame is identity

    vx = jnp.sqrt(jnp.maximum(1.0 - nv * nv, 0.0))  # (P, 1)
    vz = nv
    vdh = vx * hx + vz * hz  # (P, S)
    # L = normalize(2 (V.H) H - V)
    lx = 2.0 * vdh * hx - vx
    ly = 2.0 * vdh * hy
    lz = 2.0 * vdh * hz - vz
    ln = jnp.sqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-12))
    ndotl = jnp.maximum(lz / ln, 0.0)
    ndoth = jnp.maximum(hz, 0.0)
    vdoth = jnp.maximum(vdh, 0.0)

    k = (rough * rough) / 2.0  # brdf_lut.frag:52-54

    def g1(nd):
        return nd / (nd * (1.0 - k) + k)

    g = g1(jnp.maximum(nv, 0.0)) * g1(ndotl)
    g_vis = jnp.where(
        ndotl > 0.0, g * vdoth / jnp.maximum(ndoth * nv, 1e-6), 0.0
    )
    fc = (1.0 - vdoth) ** 5
    scale = jnp.mean((1.0 - fc) * g_vis, axis=-1).reshape(shape)
    bias = jnp.mean(fc * g_vis, axis=-1).reshape(shape)
    return scale, bias


def brdf_lut(size: int = 256, samples: int = SAMPLE_COUNT) -> jnp.ndarray:
    """(size, size, 2) LUT: x = NdotV, y = roughness (brdf_lut.frag layout)."""
    coords = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    ndotv = jnp.tile(coords[None, :], (size, 1))
    rough = jnp.tile(coords[:, None], (1, size))
    scale, bias = integrate_brdf(ndotv, rough, samples)
    return jnp.stack([scale, bias], axis=-1)
