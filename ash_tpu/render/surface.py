"""Output surfaces — the headless/display seam.

TPU-native equivalent of the reference's `SurfaceProvider` trait
(src/vulkan/surface_provider.rs:11-23): the renderer only needs
`physical_size()` and somewhere to put finished frames. Instead of a Vulkan
swapchain, a surface here receives the presented frame as a device array; the
headless implementation keeps it for readback (the CI path described in
BASELINE.json), which is the TPU analog of rendering to an offscreen image.

"Presenting" costs nothing until `read_back()` forces the async JAX dispatch —
that call is our `vkQueueWaitIdle`.
"""

from __future__ import annotations

from typing import Optional, Protocol, Tuple

import numpy as np


class SurfaceProvider(Protocol):
    """Minimal surface contract (reference surface_provider.rs:11-23)."""

    def physical_size(self) -> Tuple[int, int]:
        """(width, height) in pixels."""
        ...

    def present(self, frame) -> None:
        """Accept a finished (H, W, 4) uint8 frame (device array)."""
        ...


class HeadlessSurface:
    """Offscreen surface: frames stay in HBM until read back.

    The reference has no in-tree headless provider (WindowSurfaceProvider is
    the only impl, surface_provider.rs:26-67) — headless means "bring your
    own". Here it is the default, first-class path.
    """

    def __init__(self, width: int, height: int):
        if width <= 0 or height <= 0:
            raise ValueError(f"bad surface extent {width}x{height}")
        self._size = (int(width), int(height))
        self._frame = None
        self.presented_frames = 0

    def physical_size(self) -> Tuple[int, int]:
        return self._size

    def resize(self, width: int, height: int) -> None:
        """Analog of a window resize event; the renderer notices next frame
        (reference: request_swapchain_resize, renderer.rs:1093)."""
        self._size = (int(width), int(height))

    def present(self, frame) -> None:
        self._frame = frame
        self.presented_frames += 1

    def read_back(self) -> Optional[np.ndarray]:
        """Copy the last presented frame to host (blocks on the device)."""
        if self._frame is None:
            return None
        return np.asarray(self._frame)

    def save_png(self, path: str) -> None:
        from ..utils.image import write_png

        frame = self.read_back()
        if frame is None:
            raise RuntimeError("no frame presented yet")
        write_png(path, frame)


class FileStreamSurface:
    """Display-seam sink: streams every presented frame out of the process.

    The TPU analog of the reference's WindowSurfaceProvider
    (src/vulkan/surface_provider.rs:26-67): where that hands frames to a
    window system, this hands them to a file sink an external consumer can
    watch — numbered PNGs (``pattern`` contains ``{n}``) or one appended raw
    RGBA stream playable with e.g.
    ``ffplay -f rawvideo -pixel_format rgba -video_size WxH file.rgba``.

    Presentation pipelining: like a swapchain with ``max_frames_in_flight``
    images, the frame presented at step N is written to disk at step N+1 —
    the host readback overlaps the device rendering the next frame instead
    of fencing it.

    Tunneled-backend caveat: on a remotely tunneled chip the FIRST
    device->host readback permanently drops the JAX process out of
    pipelined dispatch (~550 ms/frame; ROADMAP.md "Tunnel dispatch
    pathology"), so a per-frame file sink there runs at sync-dispatch
    speed regardless of pipelining. On directly-attached TPU (readback
    ~us) the overlap works as designed.
    """

    def __init__(self, width: int, height: int, pattern: str,
                 max_frames_in_flight: int = 2):
        if width <= 0 or height <= 0:
            raise ValueError(f"bad surface extent {width}x{height}")
        if max_frames_in_flight < 1:
            raise ValueError("max_frames_in_flight must be >= 1")
        self._size = (int(width), int(height))
        self._pattern = pattern
        try:  # PNG sequence iff the pattern has an {n...} placeholder
            self._png = pattern.format(n=0) != pattern
        except (KeyError, IndexError, ValueError):
            raise ValueError(
                f"bad pattern {pattern!r}: only {{n}} may appear"
            ) from None
        self._queue = []  # (frame_index, device_array) awaiting writeback
        self._depth = int(max_frames_in_flight)
        self._raw = None if self._png else open(pattern, "wb")
        self._last = None
        self.presented_frames = 0
        self.written_frames = 0

    def physical_size(self) -> Tuple[int, int]:
        return self._size

    def resize(self, width: int, height: int) -> None:
        self.flush()
        self._size = (int(width), int(height))

    def present(self, frame) -> None:
        self._last = frame
        self._queue.append((self.presented_frames, frame))
        self.presented_frames += 1
        while len(self._queue) >= self._depth:
            self._write_oldest()

    def _write_oldest(self) -> None:
        index, frame = self._queue.pop(0)
        pixels = np.asarray(frame)  # blocks until the device frame is done
        if self._png:
            from ..utils.image import write_png

            write_png(self._pattern.format(n=index), pixels)
        else:
            self._raw.write(pixels.tobytes())
        self.written_frames += 1

    def flush(self) -> None:
        """Drain all in-flight frames to the sink (app exit / resize)."""
        while self._queue:
            self._write_oldest()
        if self._raw is not None:
            self._raw.flush()

    def read_back(self) -> Optional[np.ndarray]:
        if self._last is None:
            return None
        return np.asarray(self._last)

    def close(self) -> None:
        self.flush()
        if self._raw is not None:
            self._raw.close()
            self._raw = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
