"""Kernel hot-reload (the shader-watch equivalent)."""

import os
import subprocess
import sys

from ash_tpu.render.hot_reload import KernelWatcher


def test_detect_changes_on_touch():
    w = KernelWatcher()
    assert w.detect_changes() == []
    import ash_tpu.ops.tonemap as tm

    path = tm.__file__
    st = os.stat(path)
    try:
        os.utime(path, (st.st_atime, st.st_mtime + 1))
        changed = w.detect_changes()
        assert "ash_tpu.ops.tonemap" in changed
        assert w.detect_changes() == []  # consumed
    finally:
        os.utime(path, (st.st_atime, st.st_mtime))


def test_reload_in_subprocess():
    """Full reload path in an isolated interpreter: render, touch a kernel,
    render again — the frame re-traces and still produces a valid image."""
    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from ash_tpu import Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

surface = HeadlessSurface(48, 48)
r = Renderer(surface, RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                                     shadows_enabled=False,
                                     watch_kernels=True))
r.set_mesh(Mesh.create_cube())
cam = Camera.new([0, 0, 5], [0, 0, 0], 1.0)
r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
a = surface.read_back().copy()

import ash_tpu.ops.shade as shade
st = os.stat(shade.__file__)
os.utime(shade.__file__, (st.st_atime, st.st_mtime + 2))

r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
b = surface.read_back()
os.utime(shade.__file__, (st.st_atime, st.st_mtime))
assert (a == b).all(), "reloaded kernels must produce identical output"
print("HOT_RELOAD_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "HOT_RELOAD_OK" in out.stdout, out.stderr[-2000:]
