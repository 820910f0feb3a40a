"""Edge-adaptive MSAA (ops/msaa_edge.py + FrameConfig.msaa_resolve="edge").

Unit tests pin the classify/compact/resolve machinery on hand-built sample
buffers; the end-to-end tests compare the edge-adaptive resolve against the
full SSAA ground truth (edge pixels must match SSAA exactly — they shade
the identical samples — and interior pixels shade at pixel center, the
hardware MSAA rate, so the whole frame stays within a PSNR bound of SSAA).

Reference cost model being reproduced: msaa_targets.rs:24-120 (multisample
cost only at geometry edges + hardware resolve).
"""

import numpy as np
import jax.numpy as jnp

from ash_tpu.ops import msaa_edge


def test_edge_capacity_lane_alignment():
    # Includes sample counts that do NOT divide 128 (3 = ssaa 3x1, 6 =
    # 3x2, 12 = 4x3): the rounding unit is 128/gcd(s,128), not 128//s
    # (review r4 — floor rounding broke the build_worklist reshape
    # contract for those).
    for s in (2, 3, 4, 6, 8, 12):
        cap = msaa_edge.edge_capacity(1000, 0.125, s)
        assert cap * s % 128 == 0
        assert cap >= 1000 * 0.125
    # Tiny bands still get a non-zero aligned worklist.
    assert msaa_edge.edge_capacity(4, 0.125, 4) * 4 % 128 == 0
    assert msaa_edge.edge_capacity(4, 0.125, 3) * 3 % 128 == 0


def test_classify_uniform_and_edges():
    # 2x2 presentation pixels at 2x2 samples. Pixel (0,0) uniformly tri 5;
    # (0,1) split 5/7; (1,0) all background; (1,1) background + tri 7 edge.
    tid = np.full((4, 4), -1, np.int32)
    tid[0:2, 0:2] = 5
    tid[0:2, 2:4] = [[5, 7], [7, 7]]
    tid[2:4, 2:4] = [[-1, 7], [-1, -1]]
    depth = np.ones((4, 4), np.float32)
    depth[tid >= 0] = 0.5
    plan = msaa_edge.classify(jnp.asarray(tid), jnp.asarray(depth), 2, 2)
    uniform = np.asarray(plan.uniform)
    assert uniform.tolist() == [[True, False], [True, False]]
    primary = np.asarray(plan.primary_tid)
    assert primary[0, 0] == 5
    assert primary[1, 0] == -1  # all-background pixel
    # Partial-coverage pixels pick the covered (depth-nearest) sample.
    assert primary[1, 1] == 7


def test_worklist_compaction_and_coords():
    hp, wp, sy, sx = 4, 8, 2, 2
    tid = np.zeros((hp * sy, wp * sx), np.int32)
    tid[0:2, 2:4] = 9  # pixel (0,1) becomes an edge vs its tri-0 neighbors?
    # No: (0,1) covers cols 2:4 rows 0:2 entirely -> uniform tri 9. Make a
    # genuine edge: half of pixel (2,5).
    tid[4:6, 10] = 3  # pixel (2,5) spans rows 4:6, cols 10:12 -> half 3 half 0
    depth = np.full(tid.shape, 0.5, np.float32)
    plan = msaa_edge.classify(jnp.asarray(tid), jnp.asarray(depth), sy, sx)
    cap = msaa_edge.edge_capacity(hp * wp, 1.0, sy * sx)
    wl = msaa_edge.build_worklist(
        jnp.asarray(tid), plan, cap, sy, sx, y0r=16
    )
    pix = np.asarray(wl.pixel_idx)
    live = pix[pix >= 0]
    assert live.tolist() == [2 * wp + 5]
    assert int(wl.n_edge) == 1
    # The worklist's first 4 samples are pixel (2,5)'s 2x2 block, row-major.
    tids = np.asarray(wl.tid).reshape(-1)[:4]
    assert tids.tolist() == [3, 0, 3, 0]
    px = np.asarray(wl.px).reshape(-1)[:4]
    py = np.asarray(wl.py).reshape(-1)[:4]
    assert px.tolist() == [10.5, 11.5, 10.5, 11.5]
    assert py.tolist() == [16 + 4.5, 16 + 4.5, 16 + 5.5, 16 + 5.5]
    # Tile coords are band-local (no y0r).
    assert np.asarray(wl.tile_py).reshape(-1)[:4].tolist() == [4, 4, 5, 5]


def test_resolve_scatter_and_overflow():
    hp, wp, s = 2, 64, 4
    center = jnp.zeros((hp, wp, 3), jnp.float32)
    cap = 32  # 32*4 = 128: one lane row
    # Two live edge pixels, rest padded -1.
    pixel_idx = np.full((cap,), -1, np.int32)
    pixel_idx[0] = 5
    pixel_idx[1] = 70
    wl = msaa_edge.EdgeWorklist(
        pixel_idx=jnp.asarray(pixel_idx),
        tid=jnp.zeros((1, 128), jnp.int32),
        px=jnp.zeros((1, 128), jnp.float32),
        py=jnp.zeros((1, 128), jnp.float32),
        tile_px=jnp.zeros((1, 128), jnp.int32),
        tile_py=jnp.zeros((1, 128), jnp.int32),
        n_edge=jnp.int32(40),  # claims more edges than capacity
    )
    colors = np.zeros((cap, s, 3), np.float32)
    colors[0] = [1.0, 0.0, 0.0]
    colors[1, :2] = [0.0, 1.0, 0.0]  # mean = (0, 0.5, 0)
    out = np.asarray(
        msaa_edge.resolve(
            center, jnp.asarray(colors).reshape(1, 128, 3), wl, s
        )
    )
    flat = out.reshape(-1, 3)
    assert np.allclose(flat[5], [1, 0, 0])
    assert np.allclose(flat[70], [0, 0.5, 0])
    # Everything else (including overflowed pixels) keeps center shading.
    rest = np.delete(flat, [5, 70], axis=0)
    assert np.allclose(rest, 0.0)


def _render_pair(mode, extra_cfg=None, lights=False, preset="x4", size=64):
    from ash_tpu import Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    surface = HeadlessSurface(size, size)
    cfg = dict(tile_h=8, tile_w=32, max_tris_per_tile=64,
               shadows_enabled=False, msaa_resolve=mode)
    cfg.update(extra_cfg or {})
    r = Renderer(surface, RendererConfig(**cfg))
    r.set_mesh(Mesh.create_cube())
    r.set_msaa_preset(preset)
    if lights:
        r.add_point_light([1.5, 1.5, 3.0], color=(3, 1, 0), intensity=5.0,
                          radius=12.0)
    cam = Camera.new([3, 2, 4], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color), out


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_edge_matches_ssaa_with_forward_plus_lights():
    """The compacted worklist's explicit Forward+ tile coords must hit the
    same light lists as the dense iota grid: edge vs ssaa stays within a
    tight PSNR bound (interior differs only by center-vs-mean shading)."""
    ssaa, _ = _render_pair("ssaa", lights=True)
    edge, out = _render_pair("edge", lights=True)
    assert out.msaa_edge_overflow is not None
    assert int(out.msaa_edge_overflow) == 0
    assert _psnr(ssaa, edge) >= 40.0, _psnr(ssaa, edge)
    assert np.isfinite(edge).all()


def test_edge_x2_and_x8_presets():
    for preset in ("x2", "x8"):
        ssaa, _ = _render_pair("ssaa", preset=preset)
        edge, out = _render_pair("edge", preset=preset)
        assert int(out.msaa_edge_overflow) == 0
        assert _psnr(ssaa, edge) >= 40.0, (preset, _psnr(ssaa, edge))


def test_edge_overflow_degrades_to_center_shading():
    """A deliberately tiny worklist must report the overflow and keep a
    valid (center-shaded) image — never a silent cap, never garbage."""
    ssaa, _ = _render_pair("ssaa")
    edge, out = _render_pair("edge", extra_cfg={"msaa_edge_capacity": 1e-9})
    assert int(out.msaa_edge_overflow) > 0
    assert np.isfinite(edge).all()
    # Overflowed pixels fall back to center shading: still a reasonable
    # image (only silhouette pixels lose their AA).
    assert _psnr(ssaa, edge) >= 25.0


def test_edge_with_shadows_and_csm():
    """World-space shadow lookups are position-driven, not grid-driven:
    the center gbuffer and worklist shade identically under CSM."""
    from ash_tpu.render.csm import CsmConfig

    cfg = {"shadows_enabled": True, "shadow_resolution": 256,
           "csm": CsmConfig(cascade_count=2, resolution=256),
           "shadow_distance": 20.0}
    ssaa, _ = _render_pair("ssaa", extra_cfg=cfg)
    edge, out = _render_pair("edge", extra_cfg=cfg)
    assert int(out.msaa_edge_overflow) == 0
    assert _psnr(ssaa, edge) >= 40.0, _psnr(ssaa, edge)
