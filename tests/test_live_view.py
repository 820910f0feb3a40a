"""LiveViewSurface: the HTTP live-display seam (surface_provider.rs:26-67).

The reference presents through a winit window + Vulkan swapchain; the
TPU-native equivalent is an MJPEG-over-HTTP stream any browser can display.
These tests drive the real server over loopback: present frames through the
Renderer, then fetch /, /stats, /frame.png and one multipart /stream part,
and prove the mailbox (never-block, drop-stale) and fifo (bounded
back-pressure, swapchain.rs:112) present modes behave like their Vulkan
namesakes.
"""

import io
import threading
import time
import urllib.request

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import LiveViewSurface, Renderer, RendererConfig


def _get(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers, r.read()


def _wait_until(pred, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return False


def test_live_view_end_to_end():
    with LiveViewSurface(64, 48, announce=False) as surface:
        r = Renderer(
            surface,
            RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                           shadows_enabled=False),
        )
        r.set_mesh(Mesh.create_cube())
        r.set_material(Material(color=(0.2, 0.8, 0.3, 1.0)))
        cam = Camera.new([2.5, 2.0, 4.0], [0, 0, 0], 4 / 3)
        for _ in range(3):
            r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                           cam.position)
        assert surface.presented_frames == 3
        assert _wait_until(lambda: surface.encoded_frames >= 1)

        status, _, body = _get(surface.url)
        assert status == 200 and b"live view" in body

        status, headers, body = _get(surface.url + "frame.png")
        assert status == 200 and headers["Content-Type"] == "image/png"
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(body)))
        assert img.shape[:2] == (48, 64)
        assert img[..., 1].max() > 60  # something green-ish rendered

        status, _, body = _get(surface.url + "stats")
        import json

        st = json.loads(body)
        assert st["width"] == 64 and st["presented_frames"] == 3
        assert st["encoded_frames"] >= 1


def test_stream_serves_multipart_frames():
    with LiveViewSurface(32, 24, announce=False, fmt="jpeg") as surface:
        frame = np.full((24, 32, 4), 200, np.uint8)
        surface.present(frame)
        assert _wait_until(lambda: surface.encoded_frames >= 1)
        req = urllib.request.urlopen(surface.url + "stream", timeout=10)
        assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
        # Read one part: boundary line, headers, JPEG payload (SOI marker).
        line = req.readline()
        assert line.strip() == b"--ashframe"
        clen = None
        while True:
            h = req.readline().strip()
            if not h:
                break
            if h.lower().startswith(b"content-length:"):
                clen = int(h.split(b":")[1])
        assert clen and clen > 0
        payload = req.read(clen)
        assert payload[:2] == b"\xff\xd8"  # JPEG SOI
        req.close()


def test_mailbox_never_blocks_and_drops_stale():
    surface = LiveViewSurface(8, 8, announce=False)
    try:
        # Stall the encoder by presenting faster than it can drain.
        frames = [np.full((8, 8, 4), i, np.uint8) for i in range(64)]
        t0 = time.monotonic()
        for f in frames:
            surface.present(f)
        elapsed = time.monotonic() - t0
        assert elapsed < 2.0  # never blocked on the display
        assert surface.presented_frames == 64
        _wait_until(lambda: not surface._pending)
        # At most a handful actually encoded; the rest were dropped (MAILBOX).
        assert surface.dropped_frames + surface.encoded_frames == 64
        assert surface.dropped_frames > 0
    finally:
        surface.close()


def test_fifo_backpressure_bounded_and_in_order():
    surface = LiveViewSurface(8, 8, announce=False, present_mode="fifo",
                              max_frames_in_flight=2, fmt="png")
    try:
        for i in range(6):
            surface.present(np.full((8, 8, 4), i * 40, np.uint8))
        assert _wait_until(lambda: surface.encoded_frames == 6)
        assert surface.dropped_frames == 0  # FIFO: every frame displayed
    finally:
        surface.close()


def test_present_mode_validation():
    with pytest.raises(ValueError):
        LiveViewSurface(8, 8, present_mode="immediate", announce=False)
    with pytest.raises(ValueError):
        LiveViewSurface(0, 8, announce=False)


def test_fifo_present_blocks_at_depth():
    """FIFO with depth 1 and a slow encoder: the 3rd present must wait for
    an encode slot (Vulkan FIFO vsync back-pressure)."""
    surface = LiveViewSurface(128, 128, announce=False, present_mode="fifo",
                              max_frames_in_flight=1, fmt="png")
    try:
        big = np.random.randint(0, 255, (128, 128, 4), np.uint8)
        order = []

        def producer():
            for i in range(4):
                surface.present(big)
                order.append(time.monotonic())

        t = threading.Thread(target=producer)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive()
        assert _wait_until(lambda: surface.encoded_frames == 4)
    finally:
        surface.close()
