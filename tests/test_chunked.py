"""Chunked-geometry rendering (round-2 VERDICT item 3: the 65,536-instance
contract, instancing.rs:16, at scales whose per-triangle raster transients
exceed HBM).

The chunked path must be INVISIBLE: depth-compositing opaque chunks picks
exactly the winner the fused depth test picks, so a chunked render is
pixel-identical to the unchunked one."""

from __future__ import annotations

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.errors import InvalidOperation
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)

W, H = 128, 96


def make_renderer(**kw):
    r = Renderer(
        HeadlessSurface(W, H),
        RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=128,
            shadow_resolution=64, shadow_tile=64,
            shadow_max_tris_per_tile=128, **kw,
        ),
    )
    r.register_mesh_handle(0, Mesh.create_cube())
    r.register_material_handle(1, Material(color=(0.7, 0.4, 0.2, 1.0)))
    r.register_material_handle(2, Material(color=(0.2, 0.5, 0.8, 1.0)))
    r.shadow_feature.set_scene_bounds([0, 0, 0], 10.0)
    return r


def commands(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] *= 0.5
        m[:3, 3] = ((rng.random(3) - 0.5) * 7.0).astype(np.float32)
        out.append(RenderCommand(mesh=0, transform=m, material=1 + i % 2))
    return out


def render(r):
    cam = Camera.new([6.0, 5.0, 8.0], [0, 0, 0], W / H)
    return np.asarray(
        r.render_frame(
            cam.view_matrix(), cam.projection_matrix(), cam.position
        ).image
    )


def test_chunked_matches_unchunked_pixelwise():
    cmds = commands(11, seed=1)
    r_ref = make_renderer()
    r_ref.submit_render_commands(cmds)
    ref = render(r_ref)

    r_ch = make_renderer(max_draws_per_chunk=4)  # 11 draws -> 3 chunks
    r_ch.submit_render_commands(cmds)
    img = render(r_ch)
    assert r_ch._chunk_scenes is not None and len(r_ch._chunk_scenes) == 3
    assert r_ch._scene is None
    np.testing.assert_array_equal(img, ref)

    # Frame 2: chunk scenes and the merged shadow map are reused.
    map1 = r_ch._shadow_cache[1]
    img2 = render(r_ch)
    assert r_ch._shadow_cache[1] is map1
    np.testing.assert_array_equal(img2, ref)


def test_chunked_autofit_bounds_match_fused():
    """Without explicit scene bounds, the chunked path unions the chunks'
    world AABBs — the same box build_scene fits over the whole draw list —
    so the auto-fitted shadow volume (and the image) stays bit-exact."""
    def auto_renderer(**kw):  # make_renderer WITHOUT explicit bounds
        r = Renderer(
            HeadlessSurface(W, H),
            RendererConfig(
                tile_h=8, tile_w=32, max_tris_per_tile=128,
                shadow_resolution=64, shadow_tile=64,
                shadow_max_tris_per_tile=128, **kw,
            ),
        )
        r.register_mesh_handle(0, Mesh.create_cube())
        r.register_material_handle(1, Material(color=(0.7, 0.4, 0.2, 1.0)))
        r.register_material_handle(2, Material(color=(0.2, 0.5, 0.8, 1.0)))
        return r

    cmds = commands(11, seed=4)
    r_ref = auto_renderer()
    r_ref.submit_render_commands(cmds)
    ref = render(r_ref)

    r_ch = auto_renderer(max_draws_per_chunk=4)
    r_ch.submit_render_commands(cmds)
    np.testing.assert_array_equal(render(r_ch), ref)

    # ...and auto-fit keeps tracking transform updates in chunked mode.
    moved = [np.asarray(c.transform, np.float32).copy() for c in cmds]
    for m in moved:
        m[:3, 3] *= np.float32(1.5)
    r_ch.update_transforms(np.stack(moved))
    r_ref.update_transforms(np.stack(moved))
    np.testing.assert_array_equal(render(r_ch), render(r_ref))


def test_chunked_update_transforms():
    cmds = commands(9, seed=2)
    r_ch = make_renderer(max_draws_per_chunk=4)
    r_ch.submit_render_commands(cmds)
    render(r_ch)

    moved = [np.asarray(c.transform, np.float32).copy() for c in cmds]
    for m in moved:
        m[:3, 3] += np.float32(0.8)
    r_ch.update_transforms(np.stack(moved))
    img = render(r_ch)

    r_ref = make_renderer()
    r_ref.submit_render_commands(
        [
            RenderCommand(mesh=0, transform=m, material=1 + i % 2)
            for i, m in enumerate(moved)
        ]
    )
    np.testing.assert_array_equal(img, render(r_ref))


def test_chunked_rejects_unsupported_features():
    cmds = commands(9, seed=3)
    r = make_renderer(max_draws_per_chunk=4)
    r.add_point_light((0, 2, 0))
    r.submit_render_commands(cmds)
    cam = Camera.new([6, 5, 8], [0, 0, 0], W / H)
    with pytest.raises(InvalidOperation):
        r.render_frame(
            cam.view_matrix(), cam.projection_matrix(), cam.position
        )


def test_chunked_dedupes_identical_chunk_buffers():
    """Chunks with identical (mesh, material) draw sequences share ONE
    device SceneBuffers (renderer._build_chunk_scenes): uniform instancing
    fleets keep a single resident copy of the expansion maps. The render
    must still be pixel-identical to the unchunked path (world AABBs are
    recomputed per chunk from the shared template's local bounds)."""
    cmds = commands(12, seed=4)
    for c in cmds:
        c.material = 1  # uniform material -> chunks 0-2 have equal sigs
    r_ch = make_renderer(max_draws_per_chunk=4)
    r_ch.submit_render_commands(cmds)
    img = render(r_ch)

    unique = {id(s.buffers.position) for s in r_ch._chunk_scenes}
    assert len(r_ch._chunk_scenes) == 3
    assert len(unique) == 1, "identical chunks must share device buffers"

    r_ref = make_renderer()
    r_ref.submit_render_commands(cmds)
    np.testing.assert_array_equal(img, render(r_ref))


def test_chunked_presents_scaled_during_async_resize():
    """The chunked path honors the async-resize surface contract: while
    the new extent compiles in the background, presented frames are
    scaled to the requested size (review r5 — only the standard path
    applied the scale at first)."""
    r = make_renderer(max_draws_per_chunk=4)
    # A standard (unchunked) frame first: async resize needs the standard
    # warm-args snapshot; a chunked-only app falls back to sync resize.
    r.submit_render_commands(commands(3, seed=3))
    cam = Camera.new([6.0, 5.0, 8.0], [0, 0, 0], W / H)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    # The draw list grows past the chunk threshold, then the resize lands.
    r.submit_render_commands(commands(11, seed=3))
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)

    r.surface.resize(W + 32, H + 32)
    cam2 = Camera.new([6.0, 5.0, 8.0], [0, 0, 0], (W + 32) / (H + 32))
    out = r.render_frame(
        cam2.view_matrix(), cam2.projection_matrix(), cam2.position
    )
    # Transition frame: old-extent program served, presented at the new
    # extent.
    assert r.surface.read_back().shape == (H + 32, W + 32, 4)
    assert out.color.shape[0] == H
