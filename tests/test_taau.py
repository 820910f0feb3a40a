"""TAA upsampling (render_scale < 1): low-res raster + jittered history
accumulation back to presentation resolution."""

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
from ash_tpu.utils.image import psnr


def _render(scale, frames=8):
    surface = HeadlessSurface(128, 96)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False, render_scale=scale),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.8, 0.3, 0.2, 1.0), roughness=0.4))
    r.initialize_hdr()
    r.set_taa_enabled(True)
    cam = Camera.new([2.6, 1.9, 3.6], [0, 0, 0], 128 / 96)
    out = None
    for _ in range(frames):
        out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                             cam.position)
    return np.asarray(out.color), np.asarray(out.depth), surface


def test_taau_converges_to_native():
    native, _, _ = _render(scale=1.0)
    up, depth, surface = _render(scale=0.5)
    # Output is presentation-res regardless of internal scale.
    assert up.shape == native.shape == (96, 128, 3)
    assert depth.shape == (96, 128)
    assert surface.read_back().shape == (96, 128, 4)
    # After 8 accumulated jittered frames the static scene should be close
    # to the native render (TAAU detail recovery, not just bilinear blur).
    value = psnr(up, native)
    assert value >= 26.0, f"TAAU vs native PSNR {value:.1f} dB"


def test_taau_better_than_first_frame():
    """Accumulation must IMPROVE on the raw upsampled first frame."""
    native, _, _ = _render(scale=1.0)
    first, _, _ = _render(scale=0.5, frames=1)
    acc, _, _ = _render(scale=0.5, frames=10)
    assert psnr(acc, native) > psnr(first, native) + 0.5


def test_render_scale_requires_taa():
    """Without HDR+TAA the scale silently stays native (no blurry LDR)."""
    surface = HeadlessSurface(64, 48)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False, render_scale=0.5),
    )
    r.set_mesh(Mesh.create_cube())
    cam = Camera.new([2.5, 2, 4], [0, 0, 0], 4 / 3)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    assert np.asarray(out.color).shape == (48, 64, 3)
    # covered_pixels counts internal raster pixels == native here.
    assert int(out.covered_pixels) > 100


def test_render_scale_validation():
    with pytest.raises(ValueError):
        HeadlessSurface(64, 48)  # fine
        r = Renderer(
            HeadlessSurface(64, 48),
            RendererConfig(shadows_enabled=False),
        )
        r.set_render_scale(0.1)
