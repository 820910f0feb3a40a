"""GPU-driven culling wired into the frame + BRDF LUT."""

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)


def _renderer(w=96, h=64, **kw):
    surface = HeadlessSurface(w, h)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=64,
                       shadows_enabled=False, **kw),
    )
    return r, surface


def _two_cube_scene(r):
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(1, 0, 0, 1)))
    in_view = np.eye(4, dtype=np.float32)
    off_view = np.eye(4, dtype=np.float32)
    off_view[:3, 3] = [500.0, 0, 0]  # far outside the frustum
    r.submit_render_commands([
        RenderCommand(mesh=0, transform=in_view, material=1),
        RenderCommand(mesh=0, transform=off_view, material=1),
    ])


def test_frustum_culling_reports_visible_draws():
    r, surface = _two_cube_scene_helper()
    cam = Camera.new([0, 0, 5], [0, 0, 0], 96 / 64)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert int(out.visible_draws) == 1
    # The in-view cube still renders.
    img = surface.read_back()
    assert img[32, 48, 0] > 30


def _two_cube_scene_helper():
    r, surface = _renderer()
    _two_cube_scene(r)
    return r, surface


def test_culling_disabled_keeps_all_draws():
    r, _ = _renderer(frustum_culling=False)
    _two_cube_scene(r)
    cam = Camera.new([0, 0, 5], [0, 0, 0], 96 / 64)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert out.visible_draws is None


def test_occlusion_culling_two_frames():
    """Frame 1 primes the depth; frame 2 culls a cube hidden behind a wall."""
    r, surface = _renderer()
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0, 1, 0, 1)))
    wall = np.eye(4, dtype=np.float32)
    wall[0, 0], wall[1, 1], wall[2, 2] = 8.0, 8.0, 0.2  # big thin wall at z=0
    behind = np.eye(4, dtype=np.float32)
    behind[:3, 3] = [0, 0, -6.0]  # hidden behind the wall from +z camera
    r.submit_render_commands([
        RenderCommand(mesh=0, transform=wall, material=1),
        RenderCommand(mesh=0, transform=behind, material=1),
    ])
    r.set_occlusion_culling(True)
    cam = Camera.new([0, 0, 6], [0, 0, 0], 96 / 64)
    out1 = r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert int(out1.visible_draws) == 2  # no prev depth yet: frustum only
    out2 = r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert int(out2.visible_draws) == 1, "hidden cube culled via prev-frame Hi-Z"
    # Image unchanged by culling (the wall covers the hidden cube anyway).
    np.testing.assert_array_equal(
        np.asarray(out1.image), np.asarray(out2.image)
    )


def test_brdf_lut_properties():
    from ash_tpu.ops.brdf_lut import brdf_lut, integrate_brdf
    import jax.numpy as jnp

    lut = np.asarray(brdf_lut(size=32, samples=128))
    assert lut.shape == (32, 32, 2)
    assert np.all(lut >= 0.0) and np.all(lut <= 1.5)
    # Energy behavior: scale + bias <= ~1 (white furnace-ish bound).
    assert (lut.sum(-1) <= 1.05).all()
    # Smooth surface, head-on view: scale near 1, bias near 0.
    s, b = integrate_brdf(jnp.asarray(0.95), jnp.asarray(0.05), samples=256)
    assert float(s) > 0.9 and float(b) < 0.1


@pytest.mark.parametrize("seed", range(4))
def test_occlusion_culling_never_changes_the_image(seed):
    """Conservativeness, end-to-end: with a static camera, frames rendered
    WITH occlusion culling (prev-frame Hi-Z) must be pixel-identical
    (within 1 quantization LSB — the masked frame program fuses
    differently) to frames rendered WITHOUT it, on random scenes. A
    false cull makes a visible object vanish; culling truly hidden
    objects cannot change any pixel by definition. Broad insurance for
    the whole Hi-Z -> occlusion-test chain (the precise odd-level
    truncation regression lives in tests/test_ops_regressions.py)."""
    rng = np.random.default_rng(seed + 31)

    def build(occlusion):
        r, surface = _renderer(w=120, h=84)  # odd Hi-Z level chain
        r.register_mesh_handle(0, Mesh.create_cube())
        r.register_material_handle(1, Material(color=(0.8, 0.4, 0.2, 1)))
        cmds = []
        for _ in range(16):
            m = np.eye(4, dtype=np.float32)
            m[:3, 3] = rng.uniform([-3, -2, -6], [3, 2, 0], 3)
            s = rng.uniform(0.3, 1.2)
            m[0, 0] = m[1, 1] = m[2, 2] = s
            cmds.append(RenderCommand(mesh=0, transform=m, material=1))
        r.submit_render_commands(cmds)
        r.set_occlusion_culling(occlusion)
        return r, surface

    cam = Camera.new([0, 1.0, 7.0], [0, 0, 0], 120 / 84)
    v, p = cam.view_matrix(), cam.projection_matrix()

    state = rng.bit_generator.state
    r_off, s_off = build(False)
    out_off = r_off.render_frame(v, p, cam.position)
    base = s_off.read_back().copy()

    rng.bit_generator.state = state  # identical scene
    r_on, s_on = build(True)
    for _ in range(3):  # frame 1 primes the depth pyramid
        out_on = r_on.render_frame(v, p, cam.position)
    got = s_on.read_back()
    # Premise guard: with an overflowing tile, culling a hidden draw can
    # legitimately promote a dropped triangle and change pixels.
    assert int(out_off.binning_overflow) == 0
    assert int(out_on.binning_overflow) == 0
    diff = np.abs(base.astype(np.int16) - got.astype(np.int16))
    assert diff.max() <= 1, (
        f"occlusion culling changed the image: max diff {diff.max()}, "
        f"{(diff > 1).sum()} px"
    )
