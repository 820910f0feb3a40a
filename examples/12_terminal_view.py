"""Example 12: display in the terminal — zero-dependency present over SSH.

LiveViewSurface (example 11) needs a browser and a tunneled port; this is
the display a TPU host always has. `TerminalSurface` draws every presented
frame straight into the terminal — the kitty graphics protocol or sixel
where available, truecolor half-block cells everywhere else — with the same
MAILBOX/FIFO present semantics as the other surfaces (swapchain.rs:112).
The render loop is example 02's; only the surface changed (the point of the
SurfaceProvider seam, surface_provider.rs:11-23).

Run: python examples/12_terminal_view.py [seconds] [protocol]
protocol: auto (default) | kitty | sixel | ansi
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ash_tpu import Material, Mesh
from ash_tpu.core import maths
from ash_tpu.render import Renderer, RendererConfig, TerminalSurface


def main(seconds=10.0, protocol="auto"):
    seconds = float(seconds)
    with TerminalSurface(480, 360, protocol=protocol) as surface:
        renderer = Renderer(surface, RendererConfig(shadow_resolution=1024))
        renderer.set_mesh(Mesh.create_cube())
        renderer.set_material(
            Material(color=(0.8, 0.5, 0.2, 1.0), metallic=0.4, roughness=0.4)
        )
        proj = maths.perspective_rh(np.deg2rad(45), 480 / 360, 0.5, 100.0)
        proj[1, 1] *= -1.0  # Vulkan Y-flip (02_cube.rs:88)

        t0 = time.monotonic()
        frames = 0
        while time.monotonic() - t0 < seconds:
            t = (time.monotonic() - t0) * 0.8
            camera_pos = np.array(
                [5.0 * np.sin(t), 2.0, 5.0 * np.cos(t)], np.float32
            )
            view = maths.look_at_rh(camera_pos, [0, 0, 0], [0, 1, 0])
            renderer.render_frame(view, proj, camera_pos)
            frames += 1
        dt = time.monotonic() - t0
    print(
        f"rendered {frames} frames in {dt:.1f}s ({frames / dt:.1f} fps) "
        f"via {surface.protocol}; drew {surface.encoded_frames}, dropped "
        f"{surface.dropped_frames} (mailbox present)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
