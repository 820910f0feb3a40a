"""Analytic-oracle parity tests (round-2 VERDICT item 9).

Golden-image tests elsewhere in this suite compare the renderer against its
own recorded output; these tests instead compare against CLOSED-FORM
expectations computed in float64 numpy directly from the reference's
specification — evidence that does NOT route through this codebase's render
path:

1. triangle coverage: pixel centers inside the projected triangle (exact
   point-in-triangle in f64) must be colored, everything else clear;
2. a PBR-lit plane: per-pixel ray/plane intersection gives EXACT world
   positions and normals; the shade is the frag.frag formula
   (/root/reference/shaders/frag.frag:96-235) evaluated independently;
3. a PBR-lit sphere: per-pixel ray/sphere intersection gives analytic
   normals (tessellation is the only approximation);
4. the ACES fit at known constants (tonemapping.frag:19-27).
"""

from __future__ import annotations

import numpy as np

from ash_tpu import Material, Mesh, VertexArrays
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
from ash_tpu.render.renderer import (
    FRAME_AMBIENT,
    FRAME_LIGHT_COLOR,
    FRAME_LIGHT_DIR,
)

W, H = 160, 120


def psnr_u8(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0**2 / mse)


def srgb_u8(linear: np.ndarray) -> np.ndarray:
    c = np.clip(linear, 0.0, 1.0)
    enc = np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)
    return np.clip(enc * 255.0 + 0.5, 0, 255).astype(np.uint8)


def reference_pbr(world, normal, cam_pos, base_color, metallic, roughness):
    """frag.frag:96-235 in float64: GGX + Smith(k=(r+1)^2/8) + Schlick t^5,
    specular cap, kD, flat ambient, Reinhard. Shadows/textures off."""
    ld = np.asarray(FRAME_LIGHT_DIR, np.float64)
    ld = ld / np.linalg.norm(ld)
    light_dir = -ld  # frag.frag:122 normalize(-light_direction)
    light_color = np.asarray(FRAME_LIGHT_COLOR, np.float64)
    ambient = np.asarray(FRAME_AMBIENT, np.float64)
    base = np.asarray(base_color, np.float64)

    n = normal / np.linalg.norm(normal, axis=-1, keepdims=True)
    v = np.asarray(cam_pos, np.float64) - world
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    h = v + light_dir
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)

    ndl = np.maximum((n * light_dir).sum(-1), 0.0)
    ndv = np.maximum((n * v).sum(-1), 0.001)
    ndh = np.maximum((n * h).sum(-1), 0.0)
    vdh = np.maximum((v * h).sum(-1), 0.0)

    rough = max(float(roughness), 0.04)
    a = rough * rough
    a2 = a * a
    denom_d = ndh * ndh * (a2 - 1.0) + 1.0
    D = a2 / (np.pi * denom_d * denom_d)
    r1 = rough + 1.0
    k = r1 * r1 * 0.125
    G = (ndv / (ndv * (1 - k) + k)) * (ndl / (ndl * (1 - k) + k))
    f0 = 0.04 * (1.0 - metallic) + base * metallic
    t = np.clip(1.0 - vdh, 0.0, 1.0)
    t5 = t * t * t * t * t
    F = f0 + (1.0 - f0) * t5[..., None]

    spec = (D * G)[..., None] * F / (4.0 * ndv * ndl + 0.001)[..., None]
    spec = np.minimum(spec, 10.0 / np.maximum(0.04, f0))
    kd = (1.0 - F) * (1.0 - metallic)
    diffuse = kd * base / np.pi
    lo = (diffuse + spec) * light_color * ndl[..., None]
    color = ambient * base + lo
    return color / (color + 1.0)  # Reinhard (frag.frag:227)


def unproject_rays(view, proj, w, h):
    """f64 per-pixel rays through pixel centers (Vulkan NDC z in [0, 1])."""
    vp = np.asarray(proj, np.float64) @ np.asarray(view, np.float64)
    inv = np.linalg.inv(vp)
    px, py = np.meshgrid(np.arange(w), np.arange(h))
    nx = (px + 0.5) * 2.0 / w - 1.0
    ny = (py + 0.5) * 2.0 / h - 1.0

    def at(nz):
        ndc = np.stack([nx, ny, np.full_like(nx, nz), np.ones_like(nx)], -1)
        pt = ndc @ inv.T
        return pt[..., :3] / pt[..., 3:4]

    p0 = at(0.2)
    p1 = at(0.8)
    d = p1 - p0
    return p0, d / np.linalg.norm(d, axis=-1, keepdims=True)


def make_renderer(shading="pbr", **kw):
    kw.setdefault("max_tris_per_tile", 256)
    return Renderer(
        HeadlessSurface(W, H),
        RendererConfig(
            tile_h=8, tile_w=32,
            shadows_enabled=False, shading=shading, **kw,
        ),
    )


def erode(mask: np.ndarray, it: int) -> np.ndarray:
    m = mask.copy()
    for _ in range(it):
        e = m.copy()
        e[1:, :] &= m[:-1, :]
        e[:-1, :] &= m[1:, :]
        e[:, 1:] &= m[:, :-1]
        e[:, :-1] &= m[:, 1:]
        m = e
    return m


def test_triangle_coverage_oracle():
    """Exact rasterization footprint: pixel centers strictly inside the
    projected triangle are covered, strictly outside are clear; only a
    1.5-px band around the edges is rule-dependent."""
    tri = np.array(
        [[-0.8, -0.5, 0.0], [0.9, -0.3, 0.0], [0.0, 0.8, 0.0]], np.float32
    )
    mesh = Mesh(
        name="Tri",
        vertices=VertexArrays(
            position=tri,
            normal=[(0, 0, 1)] * 3,
            uv=[(0, 0), (1, 0), (0, 1)],
            color=[(1.0, 0.25, 0.1)] * 3,
            tangent=[(1, 0, 0, 1)] * 3,
        ),
        indices=np.asarray([0, 1, 2], np.uint32),
    )
    r = make_renderer(shading="flat")
    r.set_mesh(mesh)
    cam = Camera.new([0, 0, 3], [0, 0, 0], W / H)
    view, proj = cam.view_matrix(), cam.projection_matrix()
    img = np.asarray(r.render_frame(view, proj, cam.position).image)

    # f64 projection with the renderer's viewport convention.
    vp = np.asarray(proj, np.float64) @ np.asarray(view, np.float64)
    hom = np.concatenate([tri.astype(np.float64), np.ones((3, 1))], -1) @ vp.T
    ndc = hom[:, :3] / hom[:, 3:4]
    fx = (ndc[:, 0] + 1.0) * (0.5 * W)
    fy = (ndc[:, 1] + 1.0) * (0.5 * H)
    v = np.stack([fx, fy], -1)  # (3, 2) fb coords

    px, py = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)

    def edge(a, b):
        return (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])

    e0, e1, e2 = edge(v[0], v[1]), edge(v[1], v[2]), edge(v[2], v[0])
    same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    )
    # Distance (px) to the nearest edge line bounds the rule-dependent band.
    def dist(a, b, e):
        return np.abs(e) / np.hypot(b[0] - a[0], b[1] - a[1])

    d = np.minimum(
        np.minimum(dist(v[0], v[1], e0), dist(v[1], v[2], e1)),
        dist(v[2], v[0], e2),
    )
    covered = (img[..., :3] != 0).any(-1)
    decided = d > 1.5
    np.testing.assert_array_equal(covered[decided], same[decided])
    # Interior color: flat shading presents the sRGB-encoded vertex color.
    interior = same & decided
    expect = srgb_u8(np.array([1.0, 0.25, 0.1]))
    assert (img[interior][:, :3] == expect).all()


def test_pbr_plane_matches_reference_formula():
    """EXACT surface: ray/plane world positions + constant normal feed the
    independently-implemented frag.frag shade; only f32-vs-f64 rounding and
    u8 quantization separate render from oracle."""
    base = (0.62, 0.38, 0.27, 1.0)
    metallic, roughness = 0.25, 0.45
    r = make_renderer()
    r.set_mesh(Mesh.create_plane(size=2.0))
    r.set_material(
        Material(color=base, metallic=metallic, roughness=roughness)
    )
    cam = Camera.new([0.8, 2.2, 2.6], [0, 0, 0], W / H)
    view, proj = cam.view_matrix(), cam.projection_matrix()
    img = np.asarray(r.render_frame(view, proj, cam.position).image)

    p0, d = unproject_rays(view, proj, W, H)
    t = -p0[..., 1] / d[..., 1]
    world = p0 + t[..., None] * d
    hit = (
        (t > 0)
        & (np.abs(world[..., 0]) <= 2.0)
        & (np.abs(world[..., 2]) <= 2.0)
    )
    normal = np.broadcast_to(np.array([0.0, 1.0, 0.0]), world.shape)
    oracle_lin = reference_pbr(
        world, normal, cam.position, base[:3], metallic, roughness
    )
    oracle = srgb_u8(oracle_lin)

    covered = (img[..., :3] != 0).any(-1)
    m = erode(hit, 2)
    assert m.sum() > 2000
    assert covered[m].all(), "renderer must cover the analytic footprint"
    p = psnr_u8(img[m][:, :3], oracle[m])
    assert p >= 45.0, f"plane PBR oracle PSNR {p:.1f} dB < 45"


def test_pbr_sphere_matches_reference_formula():
    """Analytic normals from ray/sphere intersection; the tessellated mesh
    (128x64) is the only approximation, so the bar is lower than the
    plane's but still far above 'looks similar'."""
    base = (0.3, 0.55, 0.8, 1.0)
    metallic, roughness = 0.0, 0.7
    # ~16k triangles on an ~80 px silhouette: raise the per-tile cap and
    # drop FARTHEST on overflow so interior coverage stays complete.
    r = make_renderer(max_tris_per_tile=4096, binning_policy="nearest")
    r.set_mesh(Mesh.create_sphere(segments=128, rings=64))
    r.set_material(
        Material(color=base, metallic=metallic, roughness=roughness)
    )
    cam = Camera.new([0.0, 0.6, 3.0], [0, 0, 0], W / H)
    view, proj = cam.view_matrix(), cam.projection_matrix()
    img = np.asarray(r.render_frame(view, proj, cam.position).image)

    p0, d = unproject_rays(view, proj, W, H)
    b = (p0 * d).sum(-1)
    c = (p0 * p0).sum(-1) - 1.0
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.where(hit, disc, 0.0))
    world = p0 + t[..., None] * d
    hit &= t > 0
    oracle = srgb_u8(
        reference_pbr(world, world, cam.position, base[:3], metallic,
                      roughness)
    )
    m = erode(hit, 3)
    assert m.sum() > 1500
    covered = (img[..., :3] != 0).any(-1)
    # The polygonal silhouette sits a hair inside the analytic sphere at
    # grazing angles; allow a handful of rim pixels, nothing more.
    assert covered[m].mean() >= 0.999
    mm = m & covered
    p = psnr_u8(img[mm][:, :3], oracle[mm])
    assert p >= 38.0, f"sphere PBR oracle PSNR {p:.1f} dB < 38"


def test_aces_fit_oracle():
    """ops/tonemap.aces against the Narkowicz fit evaluated in f64
    (tonemapping.frag:19-27 constants)."""
    import jax.numpy as jnp

    from ash_tpu.ops.tonemap import aces, tonemap_compose

    x = np.linspace(0.0, 16.0, 4097, dtype=np.float32)
    got = np.asarray(aces(jnp.asarray(x)))
    xf = x.astype(np.float64)
    want = np.clip(
        (xf * (2.51 * xf + 0.03)) / (xf * (2.43 * xf + 0.59) + 0.14), 0, 1
    )
    np.testing.assert_allclose(got, want, atol=2e-6)

    # Full compose path at known constants: exposure, ACES, gamma.
    hdr = np.full((8, 128, 3), 1.7, np.float32)
    out = np.asarray(
        tonemap_compose(jnp.asarray(hdr), None, 1.3, 2.2, 0.0, "aces")
    )
    v = 1.7 * 1.3
    want = np.clip((v * (2.51 * v + 0.03)) / (v * (2.43 * v + 0.59) + 0.14),
                   0, 1) ** (1 / 2.2)
    np.testing.assert_allclose(out, want, atol=3e-6)
