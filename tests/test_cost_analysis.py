"""Renderer.frame_cost_analysis: roofline numerators without a profiler.

The bench's MFU/bandwidth accounting needs per-frame FLOPs and bytes.
The primary source is the device-timeline trace (pass_trace), but the
tunneled chip's profiler collection hangs sporadically — this API sums
XLA's static cost_analysis over the exact programs one steady-state
frame dispatches, entirely client-side."""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


def _small_cfg(**kw):
    base = dict(
        tile_h=8, tile_w=32, max_tris_per_tile=64,
        shadow_resolution=128, shadow_tile=32,
        shadow_max_tris_per_tile=64,
    )
    base.update(kw)
    return RendererConfig(**base)


def _cam():
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    return cam.view_matrix(), cam.projection_matrix(), cam.position


def test_cost_analysis_plain_fused_frame():
    r = Renderer(HeadlessSurface(64, 64), _small_cfg())
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.8, 0.3, 0.2, 1.0)))
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)  # warm: shadow renders + caches
    ca = r.frame_cost_analysis(view, proj, pos)
    assert ca["flops"] > 0
    assert ca["bytes_accessed"] > 0
    assert "frame" in ca["programs"]
    # Static scene, warm shadow cache: the shadow program must NOT be
    # part of the steady-state frame cost.
    assert "shadow" not in ca["programs"]
    # Recording is one-shot: a later frame doesn't record.
    r.render_frame(view, proj, pos)
    assert r._dispatch_record is None


def test_cost_analysis_dynamic_path():
    from ash_tpu.render import RenderCommand

    r = Renderer(HeadlessSurface(64, 64), _small_cfg())
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0.5, 0.5, 0.8, 1.0)))
    cmds = []
    t = np.zeros((4, 3), np.float32)
    q = np.tile(np.array([0, 0, 0, 1], np.float32), (4, 1))
    s = np.ones((4, 3), np.float32)
    for i in range(4):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = t[i, 0] = float(i) - 1.5
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    r.update_transforms_trs(t, q, s)
    ca = r.frame_cost_analysis(view, proj, pos)
    # The dynamic one-upload program carries the whole animated frame
    # (shadows inline), so it is the only program in the record.
    assert ca["programs"] == ["dynamic"]
    assert ca["flops"] > 0


def test_cost_analysis_post_split_pipeline():
    r = Renderer(HeadlessSurface(64, 64), _small_cfg())
    r.set_mesh(Mesh.create_cube())
    r.initialize_hdr()
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    r.wait_pipeline_optimization()
    r.render_frame(view, proj, pos)  # promoted steady state
    ca = r.frame_cost_analysis(view, proj, pos)
    # Whichever pipeline won the race, the record names it.
    assert (
        ca["programs"] == ["fused"]
        or ca["programs"] == ["band", "finalize"]
    ), ca["programs"]
    assert ca["flops"] > 0 and ca["bytes_accessed"] > 0


def test_cost_analysis_chunked_path_returns_empty():
    """The chunked-geometry path doesn't record dispatches (documented);
    frame_cost_analysis must come back empty rather than crash."""
    from ash_tpu.render import RenderCommand

    r = Renderer(HeadlessSurface(64, 64), _small_cfg(
        max_draws_per_chunk=2,
    ))
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0.6, 0.6, 0.2, 1.0)))
    cmds = []
    for i in range(5):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = float(i) - 2.0
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    view, proj, pos = _cam()
    r.render_frame(view, proj, pos)
    ca = r.frame_cost_analysis(view, proj, pos)
    assert ca["programs"] == []
    assert ca["flops"] == 0.0
