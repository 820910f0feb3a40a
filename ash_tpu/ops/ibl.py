"""Image-based lighting: environment maps consuming the split-sum BRDF LUT.

The reference ships the split-sum integration shader as IBL groundwork with
no consumer (shaders/brdf_lut.frag, SURVEY §2.3). This module completes the
pipeline: an equirectangular HDR environment becomes

- an IRRADIANCE map (brute-force cosine-weighted convolution at tiny
  resolution) for the diffuse term, and
- a PREFILTERED radiance pyramid for the specular term, where roughness
  selects the mip (the standard box-mip approximation of the GGX
  convolution — exact importance-sampled prefiltering can replace
  `prefilter_environment` without touching the sampler), with
- the (NdotV, roughness) -> (scale, bias) LUT from ops/brdf_lut.py:

    specular = prefiltered(R, roughness) * (F0 * scale + bias)
    diffuse  = irradiance(N) * albedo * kD
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .brdf_lut import brdf_lut


class EnvironmentIBL(NamedTuple):
    """Device-resident IBL bundle (see build_environment)."""

    radiance: jnp.ndarray  # (TOTAL, 3) flat-packed prefiltered mips
    table: np.ndarray  # (L, 3) STATIC: offset, width, height per mip
    levels: int
    irradiance: jnp.ndarray  # (IH, IW, 3) diffuse convolution
    lut: jnp.ndarray  # (N, N, 2) split-sum BRDF integration


def _dirs_for_equirect(h: int, w: int) -> np.ndarray:
    """(h, w, 3) unit directions of equirect texel centers."""
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi  # 0 at +Y pole
    phi = (u * 2.0 - 1.0) * np.pi
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, w))
    x = st * np.cos(phi)[None, :]
    z = st * np.sin(phi)[None, :]
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def irradiance_map(env: np.ndarray, out_h: int = 16) -> np.ndarray:
    """Cosine-weighted diffuse convolution (numpy, build-time).

    env: (H, W, 3) equirect radiance. Output (out_h, 2*out_h, 3).
    """
    h, w = env.shape[:2]
    dirs = _dirs_for_equirect(h, w).reshape(-1, 3)
    # Solid angle of each source texel: sin(theta) dtheta dphi.
    v = (np.arange(h) + 0.5) / h
    sa = (np.sin(v * np.pi) * (np.pi / h) * (2 * np.pi / w))
    weights = np.repeat(sa, w).astype(np.float32)
    radiance = env.reshape(-1, 3).astype(np.float32)

    out_w = out_h * 2
    out_dirs = _dirs_for_equirect(out_h, out_w).reshape(-1, 3)
    cos = np.clip(out_dirs @ dirs.T, 0.0, None)  # (O, H*W)
    irr = (cos * weights[None, :]) @ radiance / np.pi
    return irr.reshape(out_h, out_w, 3).astype(np.float32)


def prefilter_environment(env: np.ndarray, mips: int = 5):
    """Radiance pyramid: mip l ~ roughness l/(mips-1). Box-filter chain
    (cheap approximation; see prefilter_environment_ggx for the real GGX
    convolution used by default)."""
    out = [env.astype(np.float32)]
    cur = env.astype(np.float32)
    for _ in range(1, mips):
        h, w = cur.shape[:2]
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        cur = cur[: nh * 2, : nw * 2].reshape(nh, 2, nw, 2, 3).mean((1, 3))
        out.append(cur)
    return out


def prefilter_environment_ggx(
    env: np.ndarray, mips: int = 5, samples: int = 64
):
    """Importance-sampled GGX radiance pyramid (split-sum prefiltering).

    Mip l is the environment convolved with the GGX lobe of
    roughness l/(mips-1) under the standard N = V = R assumption:
    for each output direction N, Hammersley-driven GGX half-vectors H
    (a = roughness^2) produce light directions L = 2(N.H)H - N, and the
    radiance average is NdotL-weighted (Karis split-sum prefiltering —
    the exact counterpart of the reference's brdf_lut.frag sampling).
    Build-time; vectorized over all texels x samples.
    """
    from .brdf_lut import _hammersley

    base = jnp.asarray(env, jnp.float32)
    h0, w0 = env.shape[:2]
    flat = base.reshape(-1, 3)
    out = [np.asarray(base)]

    xi = _hammersley(samples)  # (S, 2)
    phi = 2.0 * jnp.pi * xi[:, 0]  # (S,)

    for level in range(1, mips):
        rough = level / (mips - 1)
        a = rough * rough
        nh = max(h0 >> level, 4)
        nw = max(w0 >> level, 8)
        n = jnp.asarray(
            _dirs_for_equirect(nh, nw).reshape(-1, 3)
        )  # (P, 3)

        # GGX half-vector samples in tangent space (P-independent).
        cos_t = jnp.sqrt(
            (1.0 - xi[:, 1]) / (1.0 + (a * a - 1.0) * xi[:, 1])
        )  # (S,)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        ht = jnp.stack(
            [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], -1
        )  # (S, 3)

        # Per-direction tangent frame.
        up = jnp.where(
            (jnp.abs(n[:, 1]) < 0.999)[:, None],
            jnp.asarray([0.0, 1.0, 0.0]),
            jnp.asarray([1.0, 0.0, 0.0]),
        )  # (P, 3)
        t = jnp.cross(up, n)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
        b = jnp.cross(n, t)

        # World half vectors (P, S, 3); V = N so L = 2(N.H)H - N.
        hw = (
            t[:, None] * ht[None, :, 0:1]
            + b[:, None] * ht[None, :, 1:2]
            + n[:, None] * ht[None, :, 2:3]
        )
        ndoth = jnp.sum(n[:, None] * hw, axis=-1, keepdims=True)
        lw = 2.0 * ndoth * hw - n[:, None]  # (P, S, 3)
        ndotl = jnp.maximum(
            jnp.sum(n[:, None] * lw, axis=-1), 0.0
        )  # (P, S)

        u, v = _equirect_uv(lw)
        radiance = _bilinear_flat(flat, 0, w0, h0, u, v)  # (P, S, 3)
        wsum = jnp.maximum(jnp.sum(ndotl, axis=-1, keepdims=True), 1e-6)
        color = jnp.sum(radiance * ndotl[..., None], axis=1) / wsum
        out.append(np.asarray(color.reshape(nh, nw, 3), np.float32))
    return out


def build_environment(
    env: np.ndarray, mips: int = 5, irradiance_size: int = 16,
    lut_size: int = 128, ggx_prefilter: bool = True,
    prefilter_samples: int = 64,
) -> EnvironmentIBL:
    """Build the full device bundle from an equirect (H, W, 3) radiance.

    ggx_prefilter=True (default) convolves each mip with the actual GGX
    lobe (importance-sampled); False uses the cheaper box-mip chain."""
    if ggx_prefilter:
        pyramid = prefilter_environment_ggx(env, mips, prefilter_samples)
    else:
        pyramid = prefilter_environment(env, mips)
    table = np.zeros((len(pyramid), 3), np.int64)
    off = 0
    for i, m in enumerate(pyramid):
        h, w = m.shape[:2]
        table[i] = (off, w, h)
        off += h * w
    flat = np.concatenate([m.reshape(-1, 3) for m in pyramid])
    return EnvironmentIBL(
        radiance=jnp.asarray(flat),
        table=table,
        levels=len(pyramid),
        irradiance=jnp.asarray(irradiance_map(env, irradiance_size)),
        lut=brdf_lut(lut_size),
    )


def _equirect_uv(direction: jnp.ndarray):
    d = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-8
    )
    u = jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def _bilinear_flat(flat, off, w, h, u, v):
    """Bilinear on a flat-packed equirect level (wrap U, clamp V)."""
    px = u * w - 0.5
    py = v * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    def at(xi, yi):
        xw = jnp.mod(xi, w)
        yc = jnp.clip(yi, 0, h - 1)
        return flat[off + yc * w + xw]

    top = at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx
    bot = at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def sample_radiance(ibl: EnvironmentIBL, direction, lod):
    """Trilinear sample of the prefiltered pyramid along a direction."""
    u, v = _equirect_uv(direction)
    table = jnp.asarray(ibl.table.astype(np.int32))
    lod = jnp.clip(lod, 0.0, ibl.levels - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, ibl.levels - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]

    def level(li):
        e = table[li]
        return _bilinear_flat(
            ibl.radiance, e[..., 0], e[..., 1], e[..., 2], u, v
        )

    return level(l0) * (1 - f) + level(l1) * f


def sample_irradiance(ibl: EnvironmentIBL, normal):
    u, v = _equirect_uv(normal)
    ih, iw = ibl.irradiance.shape[:2]
    flat = ibl.irradiance.reshape(-1, 3)
    return _bilinear_flat(flat, 0, iw, ih, u, v)


def ambient_ibl(
    ibl: EnvironmentIBL,
    normal: jnp.ndarray,  # (..., 3)
    view_dir: jnp.ndarray,  # (..., 3)
    base_color: jnp.ndarray,  # (..., 3)
    metallic: jnp.ndarray,  # (...)
    roughness: jnp.ndarray,  # (...)
) -> jnp.ndarray:
    """Split-sum ambient term (replaces the flat ambient when an
    environment is set)."""
    ndotv = jnp.maximum(jnp.sum(normal * view_dir, axis=-1), 1e-4)
    r = 2.0 * ndotv[..., None] * normal - view_dir

    f0 = (1.0 - metallic[..., None]) * 0.04 + metallic[..., None] * base_color
    lod = roughness * (ibl.levels - 1)
    prefiltered = sample_radiance(ibl, r, lod)

    n = ibl.lut.shape[0]
    xi = jnp.clip((ndotv * n).astype(jnp.int32), 0, n - 1)
    yi = jnp.clip((roughness * n).astype(jnp.int32), 0, n - 1)
    scale_bias = ibl.lut[yi, xi]  # (..., 2)
    specular = prefiltered * (
        f0 * scale_bias[..., 0:1] + scale_bias[..., 1:2]
    )

    irr = sample_irradiance(ibl, normal)
    kd = (1.0 - f0) * (1.0 - metallic[..., None])
    diffuse = irr * base_color * kd
    return diffuse + specular
