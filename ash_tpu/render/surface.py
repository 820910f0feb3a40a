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
