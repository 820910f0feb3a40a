"""Example 11: live display — watch the renderer in a browser.

The reference opens a winit window and presents through a Vulkan swapchain
(examples/02_cube.rs event loop; src/vulkan/surface_provider.rs:26-67).
On a headless TPU host the window is a network seam: `LiveViewSurface`
serves an MJPEG stream over HTTP, so any browser at the printed URL (tunnel
it with `ssh -L`) becomes the display. The render loop is identical to
example 02 — only the surface changed, which is the whole point of the
SurfaceProvider protocol.

Run: python examples/11_live_view.py [seconds] [port]
then open the printed URL (default picks a free port).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Material, Mesh
from ash_tpu.core import maths
from ash_tpu.render import LiveViewSurface, Renderer, RendererConfig


def main(seconds=10.0, port=0):
    seconds, port = float(seconds), int(port)
    with LiveViewSurface(640, 480, port=port) as surface:
        renderer = Renderer(surface, RendererConfig(shadow_resolution=1024))
        renderer.set_mesh(Mesh.create_cube())
        renderer.set_material(
            Material(color=(0.8, 0.2, 0.2, 1.0), metallic=0.5, roughness=0.5)
        )
        proj = maths.perspective_rh(np.deg2rad(45), 640 / 480, 0.5, 100.0)
        proj[1, 1] *= -1.0  # Vulkan Y-flip (02_cube.rs:88)

        t0 = time.monotonic()
        frames = 0
        resized = False
        while time.monotonic() - t0 < seconds:
            t = (time.monotonic() - t0) * 0.8
            if not resized and time.monotonic() - t0 > seconds / 2:
                # Live resize, no stream stall: the loop keeps presenting
                # scaled frames from the 640x480 programs while the
                # 960x540 programs compile in the background, then swaps
                # (RendererConfig.async_resize, the deferred swapchain
                # rebuild of renderer.rs:1093-1545).
                surface.resize(960, 540)
                proj = maths.perspective_rh(
                    np.deg2rad(45), 960 / 540, 0.5, 100.0
                )
                proj[1, 1] *= -1.0
                resized = True
                print("resized surface to 960x540 (async transition)")
            camera_pos = np.array(
                [5.0 * np.sin(t), 2.0, 5.0 * np.cos(t)], np.float32
            )
            view = maths.look_at_rh(camera_pos, [0, 0, 0], [0, 1, 0])
            renderer.render_frame(view, proj, camera_pos)
            frames += 1
        dt = time.monotonic() - t0
        print(
            f"rendered {frames} frames in {dt:.1f}s ({frames / dt:.1f} fps); "
            f"encoded {surface.encoded_frames}, dropped "
            f"{surface.dropped_frames} (mailbox present)"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
