"""Deep transparency: quantify the K-layer OIT approximation (VERDICT r3
item 7 / "Known gaps").

The reference alpha-blends every submitted surface in submission order
(unsorted — pipeline.rs:167-174); ash_tpu's K-layer depth peel composites
the NEAREST K layers back-to-front, which is EXACT for up to K-1
transparent surfaces over anything and approximates deeper stacks by
dropping surfaces behind layer K. These tests pin both claims against an
f64 A-buffer oracle built from the renderer's own per-surface shaded
colors (each pane rendered alone, opaque), so the oracle needs no
analytic lighting model:

- exactness to K-1 surfaces (f32-tolerance),
- the deep-stack error obeys the analytic bound: a dropped surface can
  contribute at most the transmittance through the K-1 surfaces in front
  of it,
- error decreases monotonically as K grows.
"""

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)

PX = (32, 32)  # probed pixel (pane centres project here)


def _render(alphas, K, solo=None, base=True):
    """Stack of horizontal panes under a top-down camera. alphas[i] is
    pane i's alpha, pane 0 NEAREST the camera. solo=i renders only pane i,
    opaque (isolating its shaded color). base=True adds an opaque white
    floor below the stack."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=64,
                       shadows_enabled=False,
                       transparency_layers=K),
    )
    r.register_mesh_handle(0, Mesh.create_plane("quad", size=1.5))
    rng = np.random.default_rng(42)
    commands = []
    mat = 1
    n = len(alphas)
    for i, a in enumerate(alphas):
        if solo is not None and i != solo:
            continue
        color = (*rng.random(3).tolist(), 1.0 if solo is not None else a)
        r.register_material_handle(mat, Material(color=color))
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0, 2.0 - 0.15 * i, 0]
        commands.append(RenderCommand(mesh=0, transform=m, material=mat))
        mat += 1
    else:
        # keep rng in sync for solo renders
        pass
    if solo is None and base:
        r.register_material_handle(999, Material(color=(1, 1, 1, 1.0)))
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0, 2.0 - 0.15 * n - 0.3, 0]
        commands.append(RenderCommand(mesh=0, transform=m, material=999))
    if solo is not None and base:
        pass
    r.submit_render_commands(commands)
    cam = Camera.new([0, 6.0, 0.01], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color, np.float64)


def _render_solo(alphas, i):
    """Pane i alone, opaque — its shaded surface color. The rng that
    picks colors must walk the same sequence as the full render, so
    regenerate all colors and isolate."""
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=64,
                       shadows_enabled=False),
    )
    r.register_mesh_handle(0, Mesh.create_plane("quad", size=1.5))
    rng = np.random.default_rng(42)
    colors = [rng.random(3) for _ in alphas]
    r.register_material_handle(1, Material(color=(*colors[i], 1.0)))
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [0, 2.0 - 0.15 * i, 0]
    r.submit_render_commands([RenderCommand(mesh=0, transform=m, material=1)])
    cam = Camera.new([0, 6.0, 0.01], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color, np.float64)


def _render_base(alphas):
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=64,
                       shadows_enabled=False),
    )
    r.register_mesh_handle(0, Mesh.create_plane("quad", size=1.5))
    r.register_material_handle(1, Material(color=(1, 1, 1, 1.0)))
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [0, 2.0 - 0.15 * len(alphas) - 0.3, 0]
    r.submit_render_commands([RenderCommand(mesh=0, transform=m, material=1)])
    cam = Camera.new([0, 6.0, 0.01], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color, np.float64)


def _oracle(alphas):
    """f64 back-to-front composite of the full stack at the probe pixel,
    from the renderer's own isolated surface colors."""
    y, x = PX
    c = _render_base(alphas)[y, x]
    for i in range(len(alphas) - 1, -1, -1):
        ci = _render_solo(alphas, i)[y, x]
        a = alphas[i]
        c = a * ci + (1.0 - a) * c
    return c


@pytest.mark.parametrize("n_panes,K", [(3, 4), (7, 8)])
def test_k_layer_exact_to_k_minus_1_surfaces(n_panes, K):
    alphas = [0.35 + 0.05 * i for i in range(n_panes)]
    got = _render(alphas, K)[PX]
    want = _oracle(alphas)
    assert np.abs(got - want).max() < 2e-3, (got, want)


def test_deep_stack_error_within_analytic_bound():
    """10 transparent panes at K=8: layers 8+ are approximated. A dropped
    surface's contribution is bounded by the transmittance through the
    K-1 surfaces in front of it (each |color| <= ~shade scale s), so
    |error| <= s * T where T = prod(1 - a_i, i < K-1)."""
    alphas = [0.3] * 10
    K = 8
    got = _render(alphas, K)[PX]
    want = _oracle(alphas)
    err = np.abs(got - want).max()
    # Transmittance through the first K-1 = 7 surfaces.
    T = np.prod([1 - a for a in alphas[: K - 1]])
    # Shaded pane colors peak ~2 (1.5 light + 0.35 ambient, Reinhard'd
    # to < 1 per channel; bound via the brightest isolated pane).
    s = max(_render_solo(alphas, i)[PX].max() for i in range(10)) + 1.0
    assert err <= s * T + 2e-3, (err, s * T)
    # And the bound is meaningful: the approximation is REAL (nonzero) —
    # documents that stacks deeper than K-1 are approximate, not exact.
    assert err > 1e-6, "deep stack unexpectedly exact; update PARITY.md"


def test_error_monotone_in_k():
    alphas = [0.3] * 10
    want = _oracle(alphas)
    errs = []
    for K in (2, 4, 8):
        got = _render(alphas, K)[PX]
        errs.append(np.abs(got - want).max())
    assert errs[0] >= errs[1] >= errs[2], errs
    assert errs[2] < 0.05, f"K=8 error too large: {errs}"


def _render_passes(alphas, K, passes, use_pallas=False):
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=64,
                       shadows_enabled=False,
                       transparency_layers=K,
                       transparency_passes=passes,
                       use_pallas=use_pallas),
    )
    r.register_mesh_handle(0, Mesh.create_plane("quad", size=1.5))
    rng = np.random.default_rng(42)
    commands = []
    for i, a in enumerate(alphas):
        color = (*rng.random(3).tolist(), a)
        r.register_material_handle(i + 1, Material(color=color))
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0, 2.0 - 0.15 * i, 0]
        commands.append(RenderCommand(mesh=0, transform=m, material=i + 1))
    r.register_material_handle(999, Material(color=(1, 1, 1, 1.0)))
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [0, 2.0 - 0.15 * len(alphas) - 0.3, 0]
    commands.append(RenderCommand(mesh=0, transform=m, material=999))
    r.submit_render_commands(commands)
    cam = Camera.new([0, 6.0, 0.01], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    return np.asarray(out.color, np.float64)


def test_iterated_peel_exact_beyond_single_pass():
    """transparency_passes=2 at K=4 captures 8 peel layers: a 6-pane
    stack (+opaque base = 7 surfaces) composites EXACTLY where the
    single-pass K=4 approximation measurably errs."""
    alphas = [0.3] * 6
    want = _oracle(alphas)
    single = _render_passes(alphas, 4, 1)[PX]
    double = _render_passes(alphas, 4, 2)[PX]
    err1 = np.abs(single - want).max()
    err2 = np.abs(double - want).max()
    assert err1 > 1e-4, f"single-pass unexpectedly exact ({err1})"
    assert err2 < 2e-3, f"iterated peel not exact: {err2} (single {err1})"


def test_iterated_peel_pallas_matches_scan():
    """The depth_floor path of the Pallas kernel (interpret mode on CPU)
    == the scan oracle."""
    import functools

    import ash_tpu.ops.raster_pallas as rp
    import ash_tpu.render.frame as frame_mod

    alphas = [0.4] * 5
    scan = _render_passes(alphas, 3, 2, use_pallas=False)
    orig = rp.rasterize_pallas
    saved = frame_mod.rasterize_pallas
    frame_mod.rasterize_pallas = functools.partial(orig, interpret=True)
    try:
        pallas = _render_passes(alphas, 3, 2, use_pallas=True)
    finally:
        frame_mod.rasterize_pallas = saved
    assert np.allclose(scan, pallas, atol=1e-5), (
        np.abs(scan - pallas).max()
    )
