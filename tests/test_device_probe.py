"""In-graph device-throughput probe (diagnostics/device_probe.py).

On the tunneled TPU the probe's K-frame scan slope is the only honest
per-frame device time (single-execution walls measure dispatch rate —
see the module docstring). These CPU tests pin the mechanics: positive
slope, covered counts matching a direct render, and both the plain
(single fused program) and post (band+finalize, TAA history carried
in-graph) paths building valid scans."""

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
from ash_tpu.render.diagnostics.device_probe import ingraph_device_ms


def _renderer(post=False):
    r = Renderer(HeadlessSurface(64, 64), RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=64,
        shadow_resolution=128, shadow_tile=32,
        shadow_max_tris_per_tile=64,
    ))
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.8, 0.3, 0.2, 1.0)))
    if post:
        r.initialize_hdr()
        r.set_taa_enabled(True)
    cam = Camera.new([0, 0, 4], [0, 0, 0], 1.0)
    view, proj = cam.view_matrix(), cam.projection_matrix()
    out = r.render_frame(view, proj, cam.position)
    if post:
        r.wait_pipeline_optimization()
        out = r.render_frame(view, proj, cam.position)
    return r, out


def _probe_retry(fn):
    """On a loaded single-core CI box the K-pair walls can invert from
    scheduling noise (slope <= 0 -> None); one retry with more reps
    settles it. The K contrast is wide enough that a genuine inversion
    would mean the probe is broken."""
    return fn(reps=2) or fn(reps=3)


def test_probe_plain_matches_direct_render():
    r, out = _renderer()
    res = _probe_retry(
        lambda reps: ingraph_device_ms(r, k_lo=2, k_hi=10, reps=reps)
    )
    assert res is not None
    assert res["device_ms"] > 0
    assert res["covered"] == int(out.covered_pixels)


def test_probe_post_taa_path():
    r, out = _renderer(post=True)
    res = _probe_retry(
        lambda reps: ingraph_device_ms(r, k_lo=2, k_hi=10, reps=reps)
    )
    assert res is not None
    assert res["device_ms"] > 0
    assert res["covered"] == int(out.covered_pixels)


def test_probe_dynamic_trs_path():
    from ash_tpu.render import RenderCommand
    from ash_tpu.render.diagnostics.device_probe import (
        ingraph_device_ms_dynamic,
    )

    r = Renderer(HeadlessSurface(64, 64), RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=64,
        shadow_resolution=128, shadow_tile=32,
        shadow_max_tris_per_tile=64,
    ))
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0.5, 0.5, 0.8, 1.0)))
    n = 4
    t = np.zeros((n, 3), np.float32)
    q = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    s = np.ones((n, 3), np.float32)
    cmds = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = t[i, 0] = float(i) - 1.5
        cmds.append(RenderCommand(mesh=0, transform=m, material=1))
    r.submit_render_commands(cmds)
    cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
    view, proj = cam.view_matrix(), cam.projection_matrix()
    r.render_frame(view, proj, cam.position)
    r.update_transforms_trs(t, q, s)
    out = r.render_frame(view, proj, cam.position)  # dynamic TRS frame
    assert r._dyn_args is not None and r._dyn_args[2] == "trs"
    res = _probe_retry(
        lambda reps: ingraph_device_ms_dynamic(
            r, [r._dyn_args[1]], k_lo=2, k_hi=10, reps=reps
        )
    )
    assert res is not None
    assert res["device_ms"] > 0
    assert res["covered"] == int(out.covered_pixels)


def test_probe_returns_none_without_state():
    r = Renderer(HeadlessSurface(32, 32), RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=32, shadows_enabled=False,
    ))
    assert ingraph_device_ms(r) is None
