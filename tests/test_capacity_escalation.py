"""Tile-capacity escalation: drop-free rasterization at any density.

The reference's hardware rasterizer renders every submitted triangle no
matter how many land in one tile (model_renderer.rs:309-385 has no
capacity concept). The TPU binner's bounded per-tile lists drop beyond
capacity instead; Renderer.escalate_tile_capacities is the recovery
path — feed the measured overflow back and the next frame fits. These
tests pin (a) the escalation arithmetic, (b) that an escalated render
is drop-free and pixel-identical to an uncapped one, and (c) that the
"nearest" keep policy makes over-cap drops invisible when the excess
triangles are occluded (the 1M-triangle bench's standing assumption).
"""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def _stacked_scene(r, n=24, far_first=False):
    """n unit cubes stacked along the view axis at one screen location:
    every cube's triangles bin into the same tiles, so a small cap
    overflows while the front cube occludes everything behind it.
    `far_first` submits back-to-front (painter's order) so draw-order
    drops lose the FRONT cubes."""
    cube = Mesh.create_cube()
    r.register_mesh_handle(0, cube)
    cmds = []
    order = range(n - 1, -1, -1) if far_first else range(n)
    for i in order:
        m = np.eye(4, dtype=np.float32)
        m[2, 3] = -0.15 * i  # stack away from the camera
        mat_id = i + 1
        r.register_material_handle(
            mat_id, Material(color=(0.9, 0.3 + 0.5 * (i % 2), 0.2, 1.0))
        )
        cmds.append(RenderCommand(mesh=0, transform=m, material=mat_id))
    r.submit_render_commands(cmds)
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    return cam.view_matrix(), cam.projection_matrix(), cam.position


def _render(cap, n=24, policy="nearest", shadows=False, coarse=None,
            escalate=False, far_first=False):
    surface = HeadlessSurface(64, 64)
    cfg = RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=cap,
        shadow_max_tris_per_tile=cap,
        shadows_enabled=shadows, shadow_resolution=128, shadow_tile=32,
        binning_policy=policy,
    )
    if coarse is not None:
        cfg.two_level_binning = True
        cfg.binning_coarse_cap = coarse
    r = Renderer(surface, cfg)
    view, proj, pos = _stacked_scene(r, n, far_first=far_first)
    out = r.render_frame(view, proj, pos)
    if escalate:
        changed = r.escalate_tile_capacities(
            int(out.binning_overflow),
            int(out.shadow_overflow) if out.shadow_overflow is not None else 0,
        )
        assert changed, "overflow measured but escalation changed nothing"
        out = r.render_frame(view, proj, pos)
    return r, out


def test_escalation_arithmetic():
    """r4 bench evidence replayed: cap 8192 with worst-tile excess 24376
    main / 13240 shadow escalates to 32768/32768 fine, 65536 coarse
    (cap + overflow = the worst tile's exact demand, rounded to pow2)."""
    surface = HeadlessSurface(16, 16)
    r = Renderer(surface, RendererConfig(
        max_tris_per_tile=8192, shadow_max_tris_per_tile=8192,
        binning_coarse_cap=16384,
    ))
    changed = r.escalate_tile_capacities(24376, 13240)
    assert changed == {
        "max_tris_per_tile": 32768,
        "shadow_max_tris_per_tile": 32768,
        "binning_coarse_cap": 65536,
    }
    assert r.config.max_tris_per_tile == 32768
    # No overflow = no-op.
    assert r.escalate_tile_capacities(0, 0) == {}


def test_escalated_render_is_drop_free_and_exact():
    """Tiny cap overflows; one escalation round reaches overflow 0 and the
    escalated image is pixel-identical to an uncapped render."""
    _, ref = _render(cap=512, n=24)  # 24 cubes * 12 tris = 288 < 512
    assert int(ref.binning_overflow) == 0

    r, out = _render(cap=16, n=24, escalate=True)
    assert int(out.binning_overflow) == 0
    assert r.config.max_tris_per_tile > 16  # really escalated
    np.testing.assert_array_equal(np.asarray(out.image),
                                  np.asarray(ref.image))


def test_escalation_covers_coarse_level_overflow():
    """With two-level binning and a coarse cap below the tile demand, the
    reported overflow may come from the coarse pass; escalation must raise
    the coarse cap too and converge to a drop-free render."""
    _, ref = _render(cap=512, n=24)
    r, out = _render(cap=16, n=24, coarse=32, escalate=True)
    # One round may not clear it (coarse drops hide fine demand); iterate
    # like bench.py's probe does, bounded.
    for _ in range(4):
        if int(out.binning_overflow) == 0:
            break
        r.escalate_tile_capacities(int(out.binning_overflow), 0)
        out = r.render_frame(*_cam_args())
    assert int(out.binning_overflow) == 0
    assert r.config.binning_coarse_cap > 32  # coarse cap really escalated
    np.testing.assert_array_equal(np.asarray(out.image),
                                  np.asarray(ref.image))


def _cam_args():
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    return cam.view_matrix(), cam.projection_matrix(), cam.position


def test_nearest_policy_occluded_drops_are_invisible():
    """At over-cap density, the 'nearest' policy keeps the closest
    triangles, so as long as the excess is occluded the capped image
    equals the uncapped one EXACTLY — the assumption behind running the
    1M-triangle bench with finite caps. A sub-demand cap drops most of
    the stacked cubes; the front cube occludes the rest."""
    _, ref = _render(cap=512, n=24)
    _, capped = _render(cap=16, n=24)
    assert int(capped.binning_overflow) > 0  # drops really happened
    np.testing.assert_array_equal(np.asarray(capped.image),
                                  np.asarray(ref.image))


def test_draw_order_policy_can_differ_under_overflow():
    """Contrast pin: with draw_order drops (the default policy), dropping
    by submission id keeps the FARTHEST cubes here (submitted
    back-to-front), so the capped image diverges — documenting why the
    mega config must run binning_policy='nearest'."""
    _, ref = _render(cap=512, n=24, far_first=True)
    _, capped = _render(cap=16, n=24, policy="draw_order", far_first=True)
    assert int(capped.binning_overflow) > 0
    assert not np.array_equal(np.asarray(capped.image),
                              np.asarray(ref.image))
