"""Streaming texture pool: mip residency under an HBM budget.

The texel arena is fixed at the budget, so residency changes (demotions
from the greedy fit, promotions via request_residency) rewrite pool VALUES
only — pool shapes, and therefore the frame program's jit cache key, never
change on a restream.
"""

import numpy as np
import jax.numpy as jnp

from ash_tpu import Material, Mesh, TextureData
from ash_tpu.core.transform import Camera
from ash_tpu.ops.texture_sample import sample_trilinear
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
from ash_tpu.render.bindless import BindlessTextureManager


def _checker(size):
    return TextureData.checkerboard(size=size, cell=max(size // 8, 1))


def test_unbudgeted_pool_fully_resident():
    mgr = BindlessTextureManager()
    mgr.add_sampled_image(_checker(64))
    pool = mgr.pool()
    assert pool.min_level is None
    s = mgr.stats()
    assert s["resident_bytes"] == s["bytes"]


def test_budget_demotes_largest_textures():
    mgr = BindlessTextureManager(budget_bytes=64 * 64 * 8 * 2)
    big = mgr.add_sampled_image(_checker(128))  # 128^2 chain > half budget
    small = mgr.add_sampled_image(_checker(16))
    pool = mgr.pool()
    mins = np.asarray(pool.min_level)
    assert mins[big] >= 1, "finest mip of the big texture demoted"
    assert mins[small] == 0, "small texture untouched"
    s = mgr.stats()
    assert s["resident_bytes"] <= s["budget_bytes"]
    # Arena is exactly the budget.
    assert pool.texels.shape[0] == s["budget_bytes"] // 8


def test_sampling_clamps_to_resident_mip():
    """With mip 0 non-resident, a LOD-0 sample returns mip-1 content —
    a 1px-cell checker's mip 1 is uniform grey, not the texel color."""
    tex = TextureData.checkerboard(size=16, cell=1)
    mgr = BindlessTextureManager(budget_bytes=10 * 10 * 8)  # < 16^2 texels
    idx = mgr.add_sampled_image(tex)
    pool = mgr.pool()
    assert int(np.asarray(pool.min_level)[idx]) >= 1
    # u = 3.5/16 puts the bilinear footprint exactly on texel (3, 3).
    uv = jnp.asarray([[3.5 / 16, 3.5 / 16]], jnp.float32)
    out = np.asarray(
        sample_trilinear(pool, jnp.asarray([idx]), uv, None)
    )[0]
    full = BindlessTextureManager()
    fidx = full.add_sampled_image(tex)
    ref = np.asarray(
        sample_trilinear(full.pool(), jnp.asarray([fidx]), uv, None)
    )[0]
    # The clamped sample must differ from the full-res fetch (blurred).
    assert not np.allclose(out[:3], ref[:3], atol=1e-3), (out, ref)


def test_restream_keeps_shapes_and_promotes():
    budget = (64 * 64 + 32 * 32 + 1024) * 8
    mgr = BindlessTextureManager(budget_bytes=budget)
    a = mgr.add_sampled_image(_checker(64))
    b = mgr.add_sampled_image(_checker(64))
    p0 = mgr.pool()
    shapes0 = (p0.texels.shape, p0.table.shape, p0.min_level.shape)
    mins0 = np.asarray(p0.min_level).copy()
    # Both can't be full res: one is demoted. Promote the demoted one.
    demoted = a if mins0[a] > 0 else b
    mgr.request_residency(demoted, 0)
    p1 = mgr.pool()
    shapes1 = (p1.texels.shape, p1.table.shape, p1.min_level.shape)
    assert shapes0 == shapes1, "restream must not change shapes"
    mins1 = np.asarray(p1.min_level)
    assert mins1[demoted] == 0, "promotion honored"
    other = b if demoted == a else a
    assert mins1[other] > 0, "budget pushed the other texture down"
    assert mgr.restream_count == 1


def test_budget_too_small_raises():
    import pytest
    from ash_tpu.errors import ResourceCreationError

    mgr = BindlessTextureManager(budget_bytes=8)  # one texel
    mgr.add_sampled_image(_checker(16))
    mgr.add_sampled_image(_checker(16))
    with pytest.raises(ResourceCreationError):
        mgr.pool()


def test_renderer_end_to_end_with_budget():
    """Textured render under a budget that forces mip demotion; the frame
    still renders and a restream doesn't re-trace (same pool shapes)."""
    surface = HeadlessSurface(96, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False,
                       texture_budget_bytes=48 * 48 * 8),
    )
    mesh = Mesh.create_named_cube("StreamCube")
    mesh.texture_data = _checker(64)
    r.set_mesh(mesh)
    r.set_material(Material(color=(1, 1, 1, 1)))
    cam = Camera.new([2.5, 2, 4], [0, 0, 0], 1.5)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    img0 = np.asarray(out.color)
    assert img0.max() > 0.05
    stats = r.bindless.stats()
    assert stats["resident_bytes"] <= stats["budget_bytes"]
    # Feedback promotion within budget: mips fit after demand-driven fit.
    r.request_texture_residency(0, 1)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    assert np.asarray(out.color).shape == img0.shape
