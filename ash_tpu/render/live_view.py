"""Live display seam: an HTTP viewer surface for watching renders in real time.

The reference presents through a winit window + Vulkan swapchain
(src/vulkan/surface_provider.rs:26-67 WindowSurfaceProvider;
src/vulkan/swapchain.rs:112 selects ``vk::PresentModeKHR::FIFO`` with >= 2
images). A TPU pod has no window system, so the TPU-native "window" is a
network seam: ``LiveViewSurface`` runs a tiny HTTP server in a daemon thread
and any browser (or ``curl``) on the other end of an SSH tunnel becomes the
display::

    surface = LiveViewSurface(1920, 1080)   # prints the URL
    r = Renderer(surface, ...)
    while True: r.render_frame(view, proj, eye)

Endpoints:

- ``/``          — HTML page with the live <img> stream + frame counter.
- ``/stream``    — ``multipart/x-mixed-replace`` MJPEG/PNG-JPEG motion stream
                   (the classic webcam protocol; every browser renders it).
- ``/frame.png`` — the latest frame as one PNG (poll-style consumers).
- ``/stats``     — JSON: presented/encoded/served counters + size.

Present modes (reference swapchain.rs:112 uses FIFO; we default to MAILBOX
because a render loop that outruns its display should never block on it):

- ``"mailbox"``: the render loop NEVER blocks. ``present`` stores the device
  array as "latest" and returns; a dedicated encoder thread picks up whatever
  is newest, does the device->host readback + encode OFF the render thread,
  and drops frames the display can't keep up with — Vulkan MAILBOX semantics.
- ``"fifo"``: every presented frame is queued for encoding in order;
  ``present`` blocks when ``max_frames_in_flight`` (default 2, the swapchain's
  min image count, swapchain.rs:96) encodes are outstanding — Vulkan FIFO
  back-pressure semantics.

Tunneled-backend caveat: the first device->host readback permanently drops a
remotely tunneled JAX process out of pipelined dispatch (ROADMAP.md "Tunnel
dispatch pathology"), so live viewing there runs at sync-dispatch speed
(~2 fps). On directly-attached TPU/CPU the encoder thread overlaps the device
as designed.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

_PAGE = """<!doctype html><html><head><title>ash_tpu live view</title>
<style>body{margin:0;background:#111;color:#ddd;font:13px monospace}
#bar{padding:6px 10px}img{display:block;max-width:100vw}</style></head>
<body><div id="bar">ash_tpu live view &mdash; <span id="st">...</span></div>
<img src="/stream"><script>
setInterval(async()=>{try{const r=await fetch('/stats');const s=await r.json();
document.getElementById('st').textContent=
`${s.width}x${s.height}  presented ${s.presented_frames}  encoded `+
`${s.encoded_frames}  dropped ${s.dropped_frames}  clients ${s.clients}`;
}catch(e){}},1000);</script></body></html>"""


def _encode(pixels: np.ndarray, fmt: str, quality: int) -> bytes:
    from PIL import Image

    if pixels.shape[-1] == 4:
        pixels = pixels[..., :3]  # browsers want opaque; alpha is coverage
    im = Image.fromarray(pixels)
    buf = io.BytesIO()
    if fmt == "jpeg":
        im.save(buf, "JPEG", quality=quality)
    else:
        im.save(buf, "PNG")
    return buf.getvalue()


class LiveViewSurface:
    """HTTP live-view surface (see module docstring).

    Parameters
    ----------
    width, height: surface extent in pixels (physical_size contract,
        reference surface_provider.rs:21-23).
    port: TCP port; 0 picks a free one (printed + available as ``.url``).
    host: bind address; default loopback (tunnel it; do not expose a raw
        frame stream on an open network).
    present_mode: "mailbox" (default, non-blocking, frame-dropping) or
        "fifo" (every frame, bounded back-pressure) — swapchain.rs:112.
    fmt: "jpeg" (small, fast) or "png" (lossless) stream encoding.
    """

    def __init__(
        self,
        width: int,
        height: int,
        port: int = 0,
        host: str = "127.0.0.1",
        present_mode: str = "mailbox",
        fmt: str = "jpeg",
        quality: int = 85,
        max_frames_in_flight: int = 2,
        announce: bool = True,
    ):
        if width <= 0 or height <= 0:
            raise ValueError(f"bad surface extent {width}x{height}")
        if present_mode not in ("mailbox", "fifo"):
            raise ValueError(f"unknown present_mode {present_mode!r}")
        if fmt not in ("jpeg", "png"):
            raise ValueError(f"unknown fmt {fmt!r}")
        self._size = (int(width), int(height))
        self._mode = present_mode
        self._fmt = fmt
        self._quality = int(quality)
        self._depth = max(int(max_frames_in_flight), 1)

        self._lock = threading.Condition()
        self._pending = []  # fifo: frames awaiting encode; mailbox: [newest]
        self._encoded: Optional[bytes] = None  # latest encoded frame
        self._encoded_seq = 0  # bumps per encode; stream waiters watch it
        self._closing = False
        self.presented_frames = 0
        self.encoded_frames = 0
        self.dropped_frames = 0
        self._clients = 0

        self._encoder = threading.Thread(
            target=self._encode_loop, name="ash-live-encode", daemon=True
        )
        self._server = ThreadingHTTPServer(
            (host, int(port)), self._make_handler()
        )
        self._server.daemon_threads = True
        self._http = threading.Thread(
            target=self._server.serve_forever, name="ash-live-http",
            daemon=True,
        )
        self.url = f"http://{host}:{self._server.server_address[1]}/"
        self._encoder.start()
        self._http.start()
        if announce:
            print(f"ash_tpu live view: {self.url}")

    # --- SurfaceProvider contract -------------------------------------
    def physical_size(self) -> Tuple[int, int]:
        return self._size

    def resize(self, width: int, height: int) -> None:
        self._size = (int(width), int(height))

    def present(self, frame) -> None:
        """Accept a finished (H, W, 4) uint8 frame (device array).

        Mailbox: replace the pending slot, never block. Fifo: append; block
        while `max_frames_in_flight` frames are already awaiting encode."""
        with self._lock:
            self.presented_frames += 1
            self._last = frame
            if self._mode == "mailbox":
                if self._pending:
                    self._pending[0] = frame
                    self.dropped_frames += 1
                else:
                    self._pending.append(frame)
            else:
                while len(self._pending) >= self._depth and not self._closing:
                    self._lock.wait(0.1)
                if self._closing:  # encoder gone: drop instead of queueing
                    self.dropped_frames += 1
                else:
                    self._pending.append(frame)
            self._lock.notify_all()

    def read_back(self) -> Optional[np.ndarray]:
        frame = getattr(self, "_last", None)
        if frame is None:
            return None
        return np.asarray(frame)

    # --- encoder thread -------------------------------------------------
    def _encode_loop(self) -> None:
        try:
            while True:
                with self._lock:
                    while not self._pending and not self._closing:
                        self._lock.wait(0.25)
                    if self._closing and not self._pending:
                        return
                    frame = self._pending.pop(0)
                    self._lock.notify_all()  # unblock fifo present()
                pixels = np.asarray(frame)  # device->host OFF render thread
                data = _encode(pixels, self._fmt, self._quality)
                with self._lock:
                    self._encoded = data
                    self._encoded_seq += 1
                    self.encoded_frames += 1
                    self._lock.notify_all()  # wake stream clients
        except Exception as e:
            # A dead encoder must not be silent: in fifo mode present()
            # blocks on the queue this thread drains, so dying quietly
            # would deadlock the application's render loop forever.
            import sys

            print(f"live view: encoder thread died: {e!r}; "
                  f"streaming stops, present() will not block",
                  file=sys.stderr)
            with self._lock:
                self._closing = True  # present()/clients stop waiting
                self._pending.clear()
                self._lock.notify_all()

    # --- HTTP -------------------------------------------------------------
    def _wait_frame(self, after_seq: int, timeout: float = 5.0):
        """Block until a frame newer than `after_seq` exists (or timeout).
        Returns (bytes, seq) — (None, after_seq) on timeout/close."""
        deadline = time.monotonic() + timeout
        with self._lock:
            while (
                self._encoded_seq <= after_seq
                and not self._closing
                and time.monotonic() < deadline
            ):
                self._lock.wait(0.25)
            if self._encoded_seq > after_seq and self._encoded is not None:
                return self._encoded, self._encoded_seq
            return None, after_seq

    def _make_handler(self):
        surface = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, "text/html", _PAGE.encode())
                elif self.path == "/stats":
                    with surface._lock:
                        st = {
                            "width": surface._size[0],
                            "height": surface._size[1],
                            "presented_frames": surface.presented_frames,
                            "encoded_frames": surface.encoded_frames,
                            "dropped_frames": surface.dropped_frames,
                            "clients": surface._clients,
                            "format": surface._fmt,
                            "present_mode": surface._mode,
                        }
                    self._send(200, "application/json",
                               json.dumps(st).encode())
                elif self.path == "/frame.png":
                    frame = surface.read_back()
                    if frame is None:
                        self._send(503, "text/plain", b"no frame yet")
                        return
                    self._send(200, "image/png", _encode(frame, "png", 0))
                elif self.path == "/stream":
                    ctype = (
                        "image/jpeg" if surface._fmt == "jpeg"
                        else "image/png"
                    )
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=ashframe",
                    )
                    self.end_headers()
                    with surface._lock:
                        surface._clients += 1
                    seq = 0
                    try:
                        while not surface._closing:
                            data, seq = surface._wait_frame(seq)
                            if data is None:
                                continue
                            self.wfile.write(
                                b"--ashframe\r\n"
                                + f"Content-Type: {ctype}\r\n"
                                  f"Content-Length: {len(data)}"
                                  "\r\n\r\n".encode()
                                + data + b"\r\n"
                            )
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass  # viewer closed the tab
                    finally:
                        with surface._lock:
                            surface._clients -= 1
                else:
                    self._send(404, "text/plain", b"not found")

        return Handler

    # --- lifecycle ----------------------------------------------------
    def close(self) -> None:
        with self._lock:
            self._closing = True
            self._lock.notify_all()
        self._server.shutdown()
        self._server.server_close()
        self._encoder.join(timeout=5)
        if self._encoder.is_alive():
            # Tunneled-TPU pathology: the encoder is stuck inside a
            # device->host transfer that will never return (see ROADMAP
            # "Tunnel dispatch pathology"). Normal interpreter teardown
            # with a thread inside a PJRT transfer aborts the process
            # ("FATAL: exception not rethrown", exit 134), so leave via
            # os._exit once Python finishes. An unhandled exception after
            # this point keeps exit code 1 (tracked via excepthook), so
            # crashes do not report success; a bare sys.exit(n) code is
            # still replaced (CPython handles SystemExit without calling
            # excepthook) — acceptable against an unconditional abort.
            # Never triggers on CPU or directly-attached TPU (reads
            # return in microseconds).
            import atexit
            import os
            import sys

            sys.stderr.write(
                "live view: encoder stuck in a device transfer; process "
                "will hard-exit after teardown to avoid an abort\n"
            )
            exit_code = {"value": 0}
            prev_hook = sys.excepthook

            def _hook(tp, val, tb):
                if tp is SystemExit:
                    code = val.code
                    exit_code["value"] = (
                        code if isinstance(code, int)
                        else (0 if code is None else 1)
                    )
                else:
                    exit_code["value"] = 1
                prev_hook(tp, val, tb)

            sys.excepthook = _hook
            atexit.register(
                lambda: (sys.stdout.flush(), sys.stderr.flush(),
                         os._exit(exit_code["value"]))
            )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
