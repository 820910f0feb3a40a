"""TerminalSurface: encoders + present-loop semantics (no real terminal —
frames draw into a StringIO)."""

import io
import time

import numpy as np

from ash_tpu.render.terminal_surface import (
    TerminalSurface,
    _downscale,
    detect_protocol,
    encode_ansi_halfblock,
    encode_kitty,
    encode_sixel,
)


def _checker(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = ((yy // 4 + xx // 4) % 2) * 255
    img[..., 2] = 255 - img[..., 0]
    return img


def test_downscale_exact_mean():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:2, :2] = 100
    img[2:, 2:] = 200
    out = _downscale(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == 100 and out[1, 1, 0] == 200
    assert out[0, 1, 0] == 0
    # Non-divisible ratio still produces the right shape and range.
    out2 = _downscale(_checker(10, 7), 3, 4)
    assert out2.shape == (4, 3, 3)
    assert out2.max() <= 255


def test_ansi_halfblock_encoding():
    img = np.zeros((4, 3, 3), np.uint8)
    img[0::2] = (255, 0, 0)  # top rows red
    img[1::2] = (0, 0, 255)  # bottom rows blue
    text = encode_ansi_halfblock(img)
    assert "▀" in text
    assert "38;2;255;0;0" in text  # fg = top pixel
    assert "48;2;0;0;255" in text  # bg = bottom pixel
    # Run-length: identical adjacent cells emit the color escape once.
    assert text.count("38;2;255;0;0") == 2  # once per text row


def test_kitty_encoding_roundtrip():
    import base64

    img = _checker(8, 8)
    text = encode_kitty(img)
    assert text.startswith("\x1b_Ga=T,f=24,s=8,v=8")
    payload = text.split(";", 1)[1].split("\x1b\\")[0]
    raw = base64.standard_b64decode(payload)
    assert np.array_equal(
        np.frombuffer(raw, np.uint8).reshape(8, 8, 3), img
    )


def test_sixel_encoding_structure():
    img = _checker(12, 16)
    text = encode_sixel(img)
    assert text.startswith("\x1bPq")
    assert text.endswith("\x1b\\")
    # Bands: 12 rows = 2 sixel bands.
    assert text.count("-") >= 2
    # Pure red maps to register 5*36 = 180; pure blue to 5.
    assert "#180" in text and "#5" in text


def test_surface_present_mailbox_draws_newest():
    buf = io.StringIO()
    s = TerminalSurface(16, 8, protocol="ansi", out=buf)
    try:
        for v in (10, 20, 30):
            frame = np.full((8, 16, 4), v, np.uint8)
            s.present(frame)
        deadline = time.time() + 5
        while s.encoded_frames == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert s.encoded_frames >= 1
        assert s.presented_frames == 3
    finally:
        s.close()
    out = buf.getvalue()
    assert "\x1b[H" in out  # cursor-home redraw
    assert "▀" in out


def test_surface_fifo_blocks_and_shows_every_frame():
    buf = io.StringIO()
    s = TerminalSurface(8, 4, protocol="ansi", present_mode="fifo",
                        max_frames_in_flight=2, out=buf)
    try:
        for v in range(5):
            s.present(np.full((4, 8, 4), v * 40, np.uint8))
        deadline = time.time() + 10
        while s.encoded_frames < 5 and time.time() < deadline:
            time.sleep(0.01)
        assert s.encoded_frames == 5
        assert s.dropped_frames == 0
    finally:
        s.close()


def test_detect_protocol_fallback(monkeypatch):
    monkeypatch.delenv("KITTY_WINDOW_ID", raising=False)
    monkeypatch.setenv("TERM", "xterm-256color")
    monkeypatch.delenv("ASH_TERM_SIXEL", raising=False)
    assert detect_protocol() == "ansi"
    monkeypatch.setenv("TERM", "xterm-kitty")
    assert detect_protocol() == "kitty"
    monkeypatch.setenv("TERM", "foot-sixel")
    assert detect_protocol() == "sixel"


def test_renderer_drives_terminal_surface():
    """End-to-end: the renderer presents into a TerminalSurface."""
    from ash_tpu import Mesh
    from ash_tpu.render import Renderer, RendererConfig

    buf = io.StringIO()
    surface = TerminalSurface(64, 48, protocol="ansi", out=buf)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadow_resolution=64, shadow_tile=32,
                       shadow_max_tris_per_tile=32),
    )
    r.set_mesh(Mesh.create_cube())
    from ash_tpu.core.transform import Camera

    cam = Camera.new([0, 0, 4], [0, 0, 0], 64 / 48)
    try:
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position)
        deadline = time.time() + 30
        while surface.encoded_frames == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert surface.encoded_frames >= 1
    finally:
        surface.close()
    assert "▀" in buf.getvalue()
