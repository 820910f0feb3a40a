"""FileStreamSurface: the display/present seam (surface_provider.rs:26-67).

Proves the SurfaceProvider protocol has a second, outward-facing impl:
frames presented by the renderer land in an external sink (PNG sequence or
raw RGBA stream) with swapchain-style pipelining.
"""

import os

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import FileStreamSurface, Renderer, RendererConfig
from ash_tpu.utils.image import read_png


def _render_frames(surface, n):
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.2, 0.8, 0.3, 1.0)))
    cam = Camera.new([2.5, 2.0, 4.0], [0, 0, 0], 4 / 3)
    for _ in range(n):
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position)


def test_png_sequence_sink(tmp_path):
    pattern = str(tmp_path / "frame_{n:03d}.png")
    surface = FileStreamSurface(64, 48, pattern, max_frames_in_flight=2)
    _render_frames(surface, 4)
    # Pipelined: with depth 2, one frame is still in flight until flush.
    assert surface.presented_frames == 4
    assert surface.written_frames == 3
    surface.flush()
    assert surface.written_frames == 4
    imgs = sorted(os.listdir(tmp_path))
    assert imgs == [f"frame_{i:03d}.png" for i in range(4)]
    img = read_png(str(tmp_path / imgs[0]))
    assert img.shape == (48, 64, 4)
    # Something green-ish got rendered.
    assert img[..., 1].max() > 60


def test_raw_rgba_stream_sink(tmp_path):
    path = str(tmp_path / "out.rgba")
    with FileStreamSurface(64, 48, path, max_frames_in_flight=1) as surface:
        _render_frames(surface, 3)
    size = os.path.getsize(path)
    assert size == 3 * 48 * 64 * 4
    raw = np.fromfile(path, np.uint8).reshape(3, 48, 64, 4)
    # Static camera: all three frames identical; alpha fully opaque.
    assert (raw[0] == raw[2]).all()
    assert (raw[..., 3] == 255).all()


def test_readback_still_available(tmp_path):
    surface = FileStreamSurface(64, 48, str(tmp_path / "x_{n}.png"))
    assert surface.read_back() is None
    _render_frames(surface, 1)
    img = surface.read_back()
    assert img is not None and img.shape == (48, 64, 4)
    surface.close()
