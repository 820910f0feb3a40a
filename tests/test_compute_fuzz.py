"""Property fuzzing of the Forward+ light culler and the texture sampler.

- Light culling must be CONSERVATIVE: any light that actually reaches a
  visible surface point (|view_pos - light_view| < radius, brute-forced
  in f64) must appear in that pixel's tile list. False positives are
  fine (the shade loop re-tests attenuation); a false negative is a
  light silently missing from the image — the bug class the reference's
  plane tests are most prone to.
- sample_trilinear at an integer LOD must match an f64 numpy
  REPEAT-addressed bilinear oracle on random textures and uvs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ash_tpu.core import maths
from ash_tpu.ops.light_cull import TILE_SIZE, cull_lights

W, H = 128, 96


def _synth_depth(proj, view_z):
    """NDC depth buffer of a view-space plane z = view_z(px, py)."""
    px = np.arange(W)[None, :] + 0.5
    py = np.arange(H)[:, None] + 0.5
    ndc_x = px / (0.5 * W) - 1.0
    ndc_y = py / (0.5 * H) - 1.0
    z = view_z  # (H, W) negative (in front of the camera)
    x = ndc_x * (-z) / proj[0, 0]
    y = ndc_y * (-z) / proj[1, 1]
    clip = np.stack([x * proj[0, 0], y * proj[1, 1],
                     proj[2, 2] * z + proj[2, 3], -z])
    depth = clip[2] / clip[3]
    view_pos = np.stack([x, y, z], axis=-1)
    return depth.astype(np.float32), view_pos


@pytest.mark.parametrize("seed", range(5))
def test_light_culling_no_false_negatives(seed):
    rng = np.random.default_rng(seed)
    proj = maths.perspective_rh(np.deg2rad(60), W / H, 0.1, 100.0)
    # Undulating depth: every tile gets its own depth bounds.
    px = np.arange(W)[None, :] / W
    py = np.arange(H)[:, None] / H
    view_z = -(3.0 + 6.0 * (np.sin(px * 9 + seed) * 0.5 + 0.5)
               + 4.0 * py)
    depth, view_pos = _synth_depth(proj, view_z)

    n = 24
    lights = np.zeros((n, 16), np.float32)
    lights[:, 0:3] = rng.uniform([-8, -6, -14], [8, 6, -1], (n, 3))
    lights[:, 3] = rng.uniform(0.5, 6.0, n)  # radius
    lights[:, 15] = (rng.random(n) > 0.15).astype(np.float32)  # enabled

    tl = cull_lights(
        jnp.asarray(lights), jnp.eye(4), jnp.asarray(
            np.linalg.inv(proj).astype(np.float32)),
        jnp.asarray(depth), W, H,
    )
    indices = np.asarray(tl.indices)  # (ty, tx, K)

    # Brute force in f64: light reaches pixel if within radius of the
    # pixel's view-space surface point (view = identity here).
    d2 = np.sum(
        (view_pos[None] - lights[:, None, None, 0:3].astype(np.float64))
        ** 2, axis=-1,
    )  # (L, H, W)
    reaches = (d2 < (lights[:, 3].astype(np.float64) ** 2)[:, None, None])
    reaches &= lights[:, 15][:, None, None] >= 0.5

    ty = np.arange(H) // TILE_SIZE
    tx = np.arange(W) // TILE_SIZE
    misses = []
    for li in range(n):
        ys, xs = np.nonzero(reaches[li])
        for y, x in zip(ys[::37], xs[::37]):  # subsample pixels
            tile_list = indices[ty[y], tx[x]]
            if li not in tile_list:
                misses.append((li, int(y), int(x)))
    assert not misses, f"culled lights that reach visible pixels: {misses[:5]}"


@pytest.mark.parametrize("seed", range(5))
def test_trilinear_matches_f64_oracle(seed):
    from ash_tpu.ops.texture_sample import build_pool, sample_trilinear

    rng = np.random.default_rng(seed)
    w0, h0 = int(rng.integers(5, 33)), int(rng.integers(5, 33))
    mips = []
    w, h = w0, h0
    while True:
        mips.append(rng.random((h, w, 4)).astype(np.float32))
        if w == 1 and h == 1:
            break
        w, h = max(w // 2, 1), max(h // 2, 1)
    pool = build_pool([mips])

    def oracle(level, u, v):
        m = mips[level].astype(np.float64)
        hh, ww = m.shape[:2]
        px, py = u * ww - 0.5, v * hh - 0.5
        x0, y0 = int(np.floor(px)), int(np.floor(py))
        fx, fy = px - x0, py - y0
        def at(x, y):
            return m[y % hh, x % ww]
        top = at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx
        bot = at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx
        return top * (1 - fy) + bot * fy

    uv = rng.random((64, 2)).astype(np.float32)
    for level in (0, 1, len(mips) - 1):
        got = np.asarray(sample_trilinear(
            pool, jnp.zeros(64, jnp.int32), jnp.asarray(uv),
            jnp.full(64, float(level)),
        ))
        want = np.stack([oracle(level, float(u), float(v)) for u, v in uv])
        # Texels are stored bf16 (8-bit mantissa): tolerance covers the
        # quantization of the 4 fetched corners, not the filtering math.
        np.testing.assert_allclose(got, want, atol=0.02)

    # Fractional LOD: the mip blend c0*(1-f) + c1*f, including the
    # l1 = min(l0+1, last) clamp at the pyramid tail.
    for lod in (0.3, 1.7, len(mips) - 1 + 0.4):
        l0 = min(int(np.floor(lod)), len(mips) - 1)
        l1 = min(l0 + 1, len(mips) - 1)
        f = min(lod, len(mips) - 1) - l0
        got = np.asarray(sample_trilinear(
            pool, jnp.zeros(64, jnp.int32), jnp.asarray(uv),
            jnp.full(64, float(lod)),
        ))
        want = np.stack([
            (1 - f) * oracle(l0, float(u), float(v))
            + f * oracle(l1, float(u), float(v))
            for u, v in uv
        ])
        np.testing.assert_allclose(got, want, atol=0.02)


@pytest.mark.parametrize("seed", range(5))
def test_shadow_pcf16_matches_glsl_transcription(seed):
    """shadow_pcf16 vs an independent f64 transcription of
    shaders/frag.frag:48-88: 4 textureGather quads at (+-1,+-1) texels,
    white border, slope bias max(0.05*(1-NdotL), 0.005), the z*0.5+0.5
    remap quirk, and the far-plane early-out. Random maps and fragment
    positions sweep borders and out-of-frustum cases."""
    from ash_tpu.ops.shadow import shadow_pcf16

    rng = np.random.default_rng(seed + 3)
    s = int(rng.integers(8, 33))
    smap = rng.random((s, s)).astype(np.float32)

    n = 128
    # Light-space clip positions: mostly inside, some past the borders
    # and past the far plane after the *0.5+0.5 remap. Random w exercises
    # the homogeneous divide (xy/z scale WITH w so post-divide coverage
    # stays the same).
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)
    xy = (rng.uniform(-1.4, 1.4, (n, 2)) * w[:, None]).astype(np.float32)
    zc = (rng.uniform(-1.2, 1.4, n) * w).astype(np.float32)
    frag = np.concatenate([xy, zc[:, None], w[:, None]], axis=-1)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    ldir = np.array([0.3, 0.8, 0.52], np.float32)
    ldir /= np.linalg.norm(ldir)

    got = np.asarray(shadow_pcf16(
        jnp.asarray(smap), jnp.asarray(frag), jnp.asarray(normal),
        jnp.asarray(ldir),
    ))

    m = smap.astype(np.float64)
    want = np.zeros(n)
    for i in range(n):
        proj = frag[i, :3].astype(np.float64) / frag[i, 3]
        proj = proj * 0.5 + 0.5
        ndl = float(normal[i] @ ldir)
        cmp_d = proj[2] - max(0.05 * (1.0 - ndl), 0.005)
        acc = 0
        for ox, oy in ((-1, -1), (1, -1), (-1, 1), (1, 1)):
            u = proj[0] + ox / s
            v = proj[1] + oy / s
            x0 = int(np.floor(u * s - 0.5))
            y0 = int(np.floor(v * s - 0.5))
            for dy in (0, 1):
                for dx in (0, 1):
                    xi, yi = x0 + dx, y0 + dy
                    d = (m[yi, xi]
                         if 0 <= xi < s and 0 <= yi < s else 1.0)
                    acc += int(cmp_d > d)
        want[i] = 0.0 if proj[2] > 1.0 else acc / 16.0

    # f32 vs f64 can flip a strict > on knife-edge taps; allow one tap.
    np.testing.assert_allclose(got, want, atol=1.01 / 16.0)
    assert np.mean(np.abs(got - want) < 1e-6) > 0.9, "systematic mismatch"
