"""Tiered frame compilation (RendererConfig.pipeline_mode).

Post-enabled frames cold-start on the SPLIT band+finalize programs (fast
parallel compile) while the FUSED single program compiles in a background
thread; once ready the frame loop RACES the two on the live inputs and
keeps the measured winner. These tests pin: the race happens and its
decision drives which program serves frames, promoted (fused) frames are
pixel-identical to split frames, "split"/"fused" modes pin their strategy,
and a scene reshape mid-flight falls back to the split path instead of a
synchronous re-trace.
"""

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def _make_renderer(**cfg):
    surface = HeadlessSurface(96, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False, **cfg),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(1.0, 0.3, 0.1, 1.0),
                            emissive=(4.0, 2.0, 0.5, 1.0)))
    r.initialize_hdr()
    return r, surface


def _force_fused_win(r):
    """Pin the race outcome so promotion mechanics are deterministic
    (CPU timings of tiny frames are noise; on the chip the race picks
    the real winner)."""
    r._race_pipelines = lambda config, args, iters=8: (
        "fused", {"fused": 0.0, "split": 1.0},
    )


def _cam():
    cam = Camera.new([0, 1.5, 5], [0, 0, 0], 96 / 64)
    return cam.view_matrix(), cam.projection_matrix(), cam.position


def test_tiered_promotes_to_fused_and_matches_split():
    r, surface = _make_renderer(pipeline_mode="tiered")
    _force_fused_win(r)
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    assert r.pipeline_frames["split"] >= 1
    split_img = surface.read_back().copy()
    assert r.wait_pipeline_optimization(timeout=120)
    r.render_frame(view, proj, pos)
    assert r.pipeline_frames["fused"] >= 1, (
        "background fused compile finished but the frame loop did not "
        f"promote: {r.pipeline_frames}, state={r._fused_bg}"
    )
    fused_img = surface.read_back()
    # Same math, same inputs; only XLA fusion boundaries differ.
    diff = np.abs(split_img.astype(np.int16) - fused_img.astype(np.int16))
    assert diff.max() <= 1, f"fused/split diverge: max {diff.max()}"


def test_tiered_race_decides_and_split_winner_sticks():
    """A real race runs once per (config, signature); if split wins, the
    loop keeps serving split and the decision is observable."""
    r, surface = _make_renderer(pipeline_mode="tiered")
    r._race_pipelines = lambda config, args, iters=8: (
        "split", {"fused": 1.0, "split": 0.5},
    )
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    assert r.wait_pipeline_optimization(timeout=120)
    for _ in range(3):
        r.render_frame(view, proj, pos)
    assert r.pipeline_frames["fused"] == 0
    assert r.pipeline_frames["split"] == 4
    (decision,) = r.pipeline_decisions.values()
    assert decision["winner"] == "split"
    assert decision["race_ms"] == {"fused": 1.0, "split": 0.5}


def test_tiered_real_race_runs_and_is_consistent():
    """Unpatched race on CPU: whatever wins, served frames must follow
    the decision and rendering must stay correct."""
    r, surface = _make_renderer(pipeline_mode="tiered")
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    img0 = surface.read_back().copy()
    assert r.wait_pipeline_optimization(timeout=120)
    r.render_frame(view, proj, pos)  # triggers the race, serves winner
    r.render_frame(view, proj, pos)
    (decision,) = r.pipeline_decisions.values()
    assert decision["winner"] in ("fused", "split")
    assert set(decision["race_ms"]) == {"fused", "split"}
    served = r.pipeline_frames["fused"] if decision["winner"] == "fused" \
        else r.pipeline_frames["split"] - 1
    assert served >= 2
    diff = np.abs(img0.astype(np.int16)
                  - surface.read_back().astype(np.int16))
    assert diff.max() <= 1


def test_split_mode_never_promotes():
    r, surface = _make_renderer(pipeline_mode="split")
    view, proj, pos = _cam()
    for _ in range(3):
        r.render_frame(view, proj, pos)
    r.wait_pipeline_optimization(timeout=60)
    r.render_frame(view, proj, pos)
    assert r.pipeline_frames["fused"] == 0
    assert r.pipeline_frames["split"] == 4
    assert not r._fused_bg  # no background compile was even started


def test_fused_mode_serves_fused_from_frame_one():
    r, surface = _make_renderer(pipeline_mode="fused")
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    assert r.pipeline_frames == {"split": 0, "fused": 1}


def test_scene_reshape_falls_back_to_split():
    """Growing the draw list changes the frame program's argument shapes:
    the promoted executable no longer applies; the loop must fall back to
    split (and re-kick a compile) rather than block on a fused re-trace."""
    from ash_tpu.render import RenderCommand

    r, surface = _make_renderer(pipeline_mode="tiered")
    _force_fused_win(r)
    r.register_mesh_handle(1, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(1.0, 0.3, 0.1, 1.0)))

    def cmds(n):
        return [
            RenderCommand(
                mesh=1,
                transform=np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32)
                * np.float32(1.0),
                material=1,
            )
            for _ in range(n)
        ]

    view, proj, pos = _cam()
    r.submit_render_commands(cmds(2))
    r.render_frame(view, proj, pos)
    assert r.wait_pipeline_optimization(timeout=120)
    r.render_frame(view, proj, pos)
    fused_before = r.pipeline_frames["fused"]
    assert fused_before >= 1

    r.submit_render_commands(cmds(3))  # different draw count → new shapes
    r.render_frame(view, proj, pos)  # must not raise, served by split
    assert r.pipeline_frames["fused"] == fused_before
    # A compile for the new signature is pending (or already done).
    assert r.wait_pipeline_optimization(timeout=120)
    r.render_frame(view, proj, pos)
    assert r.pipeline_frames["fused"] == fused_before + 1


def test_invalid_pipeline_mode_rejected():
    with pytest.raises(ValueError):
        RendererConfig(pipeline_mode="eager")


def test_effort_cache_normalizes_default_and_explicit_none():
    """compiled_band(cfg) and compiled_band(cfg, None) must be the SAME
    jit object — lru_cache keys raw call shapes, and two separate jits of
    the same program meant cold_compile_effort=None hit a synchronous
    re-trace + full compile in the frame loop at promotion time."""
    from ash_tpu.render.frame import (
        FrameConfig,
        compiled_band,
        compiled_finalize,
        compiled_frame,
        compiled_shadow,
    )

    cfg = FrameConfig(width=32, height=16)
    for f in (compiled_band, compiled_finalize, compiled_frame,
              compiled_shadow):
        assert f(cfg) is f(cfg, None), f.__name__
        assert f(cfg) is not f(cfg, -1.0), f.__name__


def test_tiered_with_cold_effort_disabled():
    """cold_compile_effort=None must serve, race, and promote without a
    duplicate program compile (the serving jits ARE the race's split)."""
    r, surface = _make_renderer(pipeline_mode="tiered",
                                cold_compile_effort=None)
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    img0 = surface.read_back().copy()
    assert r.wait_pipeline_optimization(timeout=180)
    for _ in range(2):
        r.render_frame(view, proj, pos)
    (decision,) = r.pipeline_decisions.values()
    assert decision["winner"] in ("fused", "split")
    diff = np.abs(img0.astype(np.int16)
                  - surface.read_back().astype(np.int16))
    assert diff.max() <= 1
