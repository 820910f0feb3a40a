"""Coverage for smaller subsystems: features, pools retention, LOD distance
mode, hiz edges, taa reprojection numerics, device profiler, instancing
submission."""

import numpy as np
import pytest


def test_feature_manager_order_and_replace():
    from ash_tpu.render.features import FeatureManager, RenderFeature

    calls = []

    class A(RenderFeature):
        def before_frame(self, ctx):
            calls.append("A")

    class B(RenderFeature):
        def before_frame(self, ctx):
            calls.append("B")

    mgr = FeatureManager()
    mgr.add(A())
    mgr.add(B())
    mgr.before_frame(None)
    assert calls == ["A", "B"], "insertion order"
    assert len(mgr) == 2
    # Re-adding a type replaces it (reference FeatureManager TypeId map).
    removed = []

    class A2(A):
        def on_removed(self, r):
            removed.append(1)

    a2 = A2()
    mgr.add(a2)
    mgr.add(A2())  # replaces a2 -> on_removed fires
    assert removed == [1]
    assert mgr.get(A2) is not None
    assert mgr.remove(A2)
    assert not mgr.remove(A2)


def test_auto_rotate_feature():
    from ash_tpu.core.transform import Transform
    from ash_tpu.render.features import AutoRotateFeature, FeatureFrameContext

    t = Transform()
    feat = AutoRotateFeature(speed=(0.0, np.pi / 2, 0.0))
    ctx = FeatureFrameContext(delta_time=1.0, auto_rotate=True, transform=t)
    feat.before_frame(ctx)
    from ash_tpu.core import maths

    p = maths.transform_point(t.model_matrix(), [0, 0, 1])
    np.testing.assert_allclose(p, [1, 0, 0], atol=1e-5)
    # Disabled: no rotation.
    t2 = Transform()
    feat.before_frame(FeatureFrameContext(delta_time=1.0, auto_rotate=False,
                                          transform=t2))
    np.testing.assert_allclose(t2.rotation, [0, 0, 0, 1])


def test_optimized_pool_class_cap():
    from ash_tpu.render.pools import BufferPoolConfig, OptimizedBufferPool

    pool = OptimizedBufferPool(BufferPoolConfig(max_buffers_per_class=2))
    bufs = [pool.acquire(300) for _ in range(4)]
    for b in bufs:
        pool.release(b)
    # Only 2 retained in the 512 class.
    assert pool.stats[512].available == 2
    assert pool.total_bytes() >= 512 * 2


def test_lod_distance_mode():
    from ash_tpu.render.lod_system import (
        LodConfig,
        LodLevel,
        LodManager,
        LodMesh,
        LodSelectionMode,
    )
    from ash_tpu.core import maths

    mgr = LodManager(LodConfig(mode=LodSelectionMode.DISTANCE))
    mesh = LodMesh("m", [
        LodLevel(distance_threshold=5.0, triangle_count=100),
        LodLevel(distance_threshold=20.0, triangle_count=25),
        LodLevel(distance_threshold=1e9, triangle_count=5),
    ])
    view = maths.look_at_rh([0, 0, 10], [0, 0, 0], [0, 1, 0])
    proj = maths.perspective_rh(np.deg2rad(45), 1.0, 0.1, 100.0)
    vp = proj @ view
    near = mgr.select_lod(mesh, [0, 0, 7], vp, [0, 0, 10], 800, 600)
    far = mgr.select_lod(mesh, [0, 0, -8], vp, [0, 0, 10], 800, 600)
    assert near.level == 0 and far.level == 1


def test_lod_object_bias():
    from ash_tpu.render.lod_system import (
        LodConfig, LodLevel, LodManager, LodMesh,
    )
    from ash_tpu.core import maths

    mgr = LodManager(LodConfig(smooth_transitions=False))
    mgr.set_object_bias("m", 1.0)
    mesh = LodMesh("m", [
        LodLevel(screen_threshold=0.0, triangle_count=100),
        LodLevel(screen_threshold=0.0, triangle_count=10),
    ])
    view = maths.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    proj = maths.perspective_rh(np.deg2rad(45), 1.0, 0.1, 100.0)
    sel = mgr.select_lod(mesh, [0, 0, 0], proj @ view, [0, 0, 5], 800, 600)
    assert sel.level == 1, "bias pushes one level down"


def test_hiz_single_pixel_and_rect():
    import jax.numpy as jnp

    from ash_tpu.ops import hiz

    pyr = hiz.build_hiz(jnp.full((1, 1), 0.25))
    assert pyr.levels == 1
    pyr2 = hiz.build_hiz(jnp.ones((4, 16)))
    # Non-square: reduces to 1x4 then 1x2 then 1x1.
    assert pyr2.level(pyr2.levels - 1).shape == (1, 1)


def test_taa_reprojection_numeric():
    """History sampled at uv - velocity: a shifted history realigns."""
    import jax.numpy as jnp

    from ash_tpu.ops.taa import TaaParams, taa_resolve

    h = w = 16
    # History has a bright column at x=8; the camera moved so that surface
    # now appears at x=10 (velocity = +2 px in u).
    history = jnp.zeros((h, w, 3)).at[:, 8].set(1.0)
    current = jnp.zeros((h, w, 3)).at[:, 10].set(1.0)
    vel = jnp.zeros((h, w, 2)).at[..., 0].set(2.0 / w)
    params = TaaParams(
        blend_factor=jnp.float32(1.0),  # history only
        color_clamp=jnp.float32(0.0),
        velocity_rejection=jnp.float32(0.0),
        jitter=jnp.zeros(2),
        prev_jitter=jnp.zeros(2),
    )
    out = np.asarray(taa_resolve(current, history, params, velocity=vel))
    # Reprojected history's bright column lands at x=10, matching current.
    assert out[8, 10].max() > 0.9
    assert out[8, 8].max() < 0.1


def test_device_profiler_scopes():
    from ash_tpu.render.diagnostics import DeviceProfiler

    p = DeviceProfiler(sample_interval=1, enabled=True)
    p.begin_frame()
    with p.scope("FrameStart"):
        sum(range(1000))
    t = p.timings_ms()
    assert "FrameStart" in t and t["FrameStart"] >= 0.0
    # Disabled profiler records nothing new.
    p2 = DeviceProfiler(enabled=False)
    p2.begin_frame()
    with p2.scope("X"):
        pass
    assert p2.timings_ms() == {}


def test_instancing_to_draw_items_submission():
    from ash_tpu import Material, Mesh
    from ash_tpu.core import maths
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig
    from ash_tpu.render.instancing import InstanceData, InstancingManager

    r = Renderer(
        HeadlessSurface(48, 48),
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.register_mesh_handle(7, Mesh.create_cube())
    r.register_material_handle(3, Material(color=(0, 1, 0, 1)))
    mgr = InstancingManager()
    for i in range(3):
        mgr.add_instance(7, 3, InstanceData(
            model=maths.mat4_translation([i * 2.5 - 2.5, 0, 0])))
    mgr.to_draw_items(r)
    assert len(r.draw_items) == 3
    from ash_tpu.core.transform import Camera

    cam = Camera.new([0, 0, 8], [0, 0, 0], 1.0)
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    assert int(out.covered_pixels) > 0


def test_errors_taxonomy():
    from ash_tpu import errors

    for name in ("VulkanError", "SwapchainOutOfDate", "ShaderCompilationError",
                 "ResourceCreationError", "InvalidOperation", "OutOfMemory",
                 "DeviceLost"):
        cls = getattr(errors, name)
        assert issubclass(cls, errors.AshError)
        with pytest.raises(errors.AshError):
            raise cls("boom")


def test_bindless_capacity_and_stats():
    from ash_tpu.core.texture import TextureData
    from ash_tpu.errors import ResourceCreationError
    from ash_tpu.render.bindless import BindlessTextureManager

    mgr = BindlessTextureManager(capacity=2)
    a = mgr.add_sampled_image(TextureData.white())
    b = mgr.add_sampled_image(TextureData.checkerboard(8, 2))
    assert (a, b) == (0, 1), "monotonic indices, never recycled"
    with pytest.raises(ResourceCreationError):
        mgr.add_sampled_image(TextureData.white())
    st = mgr.stats()
    assert st["textures"] == 2 and st["texels"] > 0
    assert mgr.pool() is not None
