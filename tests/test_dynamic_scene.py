"""Dynamic-scene fast path + shadow cache (round-2 VERDICT items 1-2).

The reference animates for free: model matrices ride per-draw push constants
(src/renderer/model_renderer.rs:309-385) and the draw list is re-recorded
per frame (renderer.rs:1917-1990). The TPU equivalents under test:

- submit_render_commands detects geometry-identical resubmits and updates
  ONLY the device model-matrix array (no build_scene, no re-trace);
- Renderer.update_transforms / update_material edit device state directly;
- the shadow map renders in its own program and is CACHED while
  (scene, models, light matrix) are unchanged — and correctly invalidated
  the moment any of them changes.
"""

from __future__ import annotations

import numpy as np

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)

W, H = 96, 64


def small_cfg(**kw):
    return RendererConfig(
        tile_h=8, tile_w=32, max_tris_per_tile=64,
        shadow_resolution=64, shadow_tile=64, shadow_max_tris_per_tile=64,
        **kw,
    )


def make_renderer(**kw):
    r = Renderer(HeadlessSurface(W, H), small_cfg(**kw))
    r.register_mesh_handle(0, Mesh.create_cube())
    # Explicit bounds: both the fresh-build and fast-update paths then use a
    # bitwise-identical light volume (auto-fit is covered separately below).
    r.shadow_feature.set_scene_bounds([0, 0, 0], 8.0)
    return r


def camera():
    cam = Camera.new([5.0, 4.0, 6.0], [0, 0, 0], W / H)
    return cam.view_matrix(), cam.projection_matrix(), cam.position


def make_transforms(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = ((rng.random(3) - 0.5) * spread).astype(np.float32)
        out.append(m)
    return out


def commands(transforms, material=1):
    return [
        RenderCommand(mesh=0, transform=t, material=material)
        for t in transforms
    ]


def register_mat(r, color=(0.8, 0.3, 0.2, 1.0), handle=1):
    r.register_material_handle(handle, Material(color=color))
    return handle


def render(r):
    view, proj, pos = camera()
    return np.asarray(r.render_frame(view, proj, pos).image)


def fresh_image(transforms, color=(0.8, 0.3, 0.2, 1.0)):
    r = make_renderer()
    register_mat(r, color)
    r.submit_render_commands(commands(transforms))
    return render(r)


def test_resubmit_same_geometry_takes_fast_path():
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(6, seed=1)
    r.submit_render_commands(commands(t0))
    render(r)
    scene_before = r._scene
    epoch_before = r._scene_epoch
    models_epoch_before = r._models_epoch

    t1 = make_transforms(6, seed=2)
    r.submit_render_commands(commands(t1))
    img = render(r)

    assert r._scene is scene_before, "fast path must not rebuild the scene"
    assert r._scene_epoch == epoch_before
    assert r._models_epoch > models_epoch_before
    np.testing.assert_array_equal(img, fresh_image(t1))


def test_update_transforms_array_matches_rebuild():
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(5, seed=3)
    r.submit_render_commands(commands(t0))
    render(r)
    t1 = make_transforms(5, seed=4)
    r.update_transforms(np.stack(t1))
    np.testing.assert_array_equal(render(r), fresh_image(t1))


def test_update_transforms_sparse_dict():
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(5, seed=5)
    r.submit_render_commands(commands(t0))
    render(r)
    moved = np.eye(4, dtype=np.float32)
    moved[:3, 3] = [1.5, 0.5, -1.0]
    r.update_transforms({2: moved})
    expect = list(t0)
    expect[2] = moved
    np.testing.assert_array_equal(render(r), fresh_image(expect))


def test_update_material_changes_pixels_without_rebuild():
    r = make_renderer()
    h = register_mat(r, (0.8, 0.3, 0.2, 1.0))
    t0 = make_transforms(4, seed=6)
    r.submit_render_commands(commands(t0))
    img_red = render(r)
    scene_before = r._scene

    r.update_material(h, Material(color=(0.1, 0.2, 0.9, 1.0)))
    img_blue = render(r)
    assert r._scene_epoch == 1 and r._scene is not None
    assert not np.array_equal(img_red, img_blue)
    np.testing.assert_array_equal(
        img_blue, fresh_image(t0, color=(0.1, 0.2, 0.9, 1.0))
    )
    # Geometry buffers untouched (materials table replaced, rest shared).
    assert r._scene.buffers.position is scene_before.buffers.position


def test_reregister_material_invalidates_fast_path():
    r = make_renderer()
    h = register_mat(r, (0.8, 0.3, 0.2, 1.0))
    t0 = make_transforms(4, seed=7)
    r.submit_render_commands(commands(t0))
    render(r)
    # Re-registering bumps the registry version: the NEXT submit must take
    # the slow path and pick up the new factors.
    r.register_material_handle(h, Material(color=(0.1, 0.9, 0.2, 1.0)))
    r.submit_render_commands(commands(t0))
    np.testing.assert_array_equal(
        render(r), fresh_image(t0, color=(0.1, 0.9, 0.2, 1.0))
    )


def test_shadow_cache_reused_when_static():
    r = make_renderer()
    register_mat(r)
    r.submit_render_commands(commands(make_transforms(4, seed=8)))
    img1 = render(r)
    assert r._shadow_cache is not None
    map1 = r._shadow_cache[1]
    img2 = render(r)
    assert r._shadow_cache[1] is map1, "static frame must reuse the map"
    np.testing.assert_array_equal(img1, img2)


def test_shadow_cache_invalidated_by_transform_update():
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(4, seed=9)
    r.submit_render_commands(commands(t0))
    render(r)
    map1 = r._shadow_cache[1]
    t1 = [t.copy() for t in t0]
    t1[0][:3, 3] += np.float32(1.0)
    r.update_transforms(np.stack(t1))
    img = render(r)
    # The dynamic frame renders shadows INLINE (one dispatch) and drops the
    # stale cached map; what must never happen is serving the old map.
    assert r._shadow_cache is None or r._shadow_cache[1] is not map1, (
        "moved models must not serve the cached shadow map"
    )
    np.testing.assert_array_equal(img, fresh_image(t1))


def test_shadow_cache_invalidated_by_light_change():
    r = make_renderer()
    register_mat(r)
    r.submit_render_commands(commands(make_transforms(4, seed=10)))
    render(r)
    map1 = r._shadow_cache[1]
    r.shadow_feature.set_light_direction([0.3, -1.0, 0.5])
    render(r)
    assert r._shadow_cache[1] is not map1


def test_auto_fit_bounds_track_moving_objects():
    # Without explicit bounds, a transform update must refresh the
    # auto-fitted shadow volume from the new world AABB.
    r = Renderer(HeadlessSurface(W, H), small_cfg())
    r.register_mesh_handle(0, Mesh.create_cube())
    register_mat(r)
    t0 = make_transforms(3, seed=11, spread=2.0)
    r.submit_render_commands(commands(t0))
    render(r)
    r0 = r.shadow_feature.scene_radius
    t1 = [t.copy() for t in t0]
    t1[0][:3, 3] = [20.0, 0.0, 0.0]  # fly one cube far away
    r.update_transforms(np.stack(t1))
    assert r.shadow_feature.scene_radius > r0 + 5.0

    # And the refreshed bounds match what a fresh build computes.
    r2 = Renderer(HeadlessSurface(W, H), small_cfg())
    r2.register_mesh_handle(0, Mesh.create_cube())
    register_mat(r2)
    r2.submit_render_commands(commands(t1))
    render(r2)
    np.testing.assert_allclose(
        r.shadow_feature.scene_center, r2.shadow_feature.scene_center,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        r.shadow_feature.scene_radius, r2.shadow_feature.scene_radius,
        rtol=1e-5,
    )


def test_update_transforms_before_first_frame():
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(3, seed=12)
    r.submit_render_commands(commands(t0))
    t1 = make_transforms(3, seed=13)
    r.update_transforms(np.stack(t1))  # scene not built yet
    np.testing.assert_array_equal(render(r), fresh_image(t1))


def test_resubmit_larger_list_after_dense_update():
    """A dense update defers the DrawItem writeback; replacing the draw
    list afterwards (different signature / size) must not stamp the OLD
    scene's matrices onto the new items (was: IndexError when the list
    grew, silent wrong transforms when equal-sized)."""
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(2, seed=3)
    r.submit_render_commands(commands(t0))
    render(r)
    r.update_transforms(np.stack(make_transforms(2, seed=4)))
    render(r)
    # Replace with a LARGER list — the old 2-row _models_host must not be
    # applied to 3 items.
    t1 = make_transforms(3, seed=5)
    r.submit_render_commands(commands(t1))
    np.testing.assert_array_equal(render(r), fresh_image(t1))


def test_resubmit_same_size_new_signature_after_dense_update():
    """Equal-sized replacement with a different signature (new material
    handle) must render the NEW transforms, not the stale _models_host."""
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(3, seed=6)
    r.submit_render_commands(commands(t0))
    render(r)
    r.update_transforms(np.stack(make_transforms(3, seed=7)))
    render(r)
    h2 = register_mat(r, handle=2)  # new handle -> different submit sig
    t1 = make_transforms(3, seed=8)
    r.submit_render_commands(commands(t1, material=h2))
    np.testing.assert_array_equal(render(r), fresh_image(t1))


def test_update_material_before_first_render_applies():
    """update_material between submit and the first render (scene still
    dirty) must land in the rebuild — it silently no-opped before."""
    r = make_renderer()
    h = register_mat(r, color=(0.1, 0.1, 0.9, 1.0))
    t0 = make_transforms(3, seed=21)
    r.submit_render_commands(commands(t0, material=h))
    from ash_tpu import Material
    r.update_material(h, Material(color=(0.9, 0.1, 0.1, 1.0)))  # scene dirty
    img = render(r)
    # A fresh renderer built directly with the red material must match.
    r2 = make_renderer()
    register_mat(r2, color=(0.9, 0.1, 0.1, 1.0))
    r2.submit_render_commands(commands(t0))
    np.testing.assert_array_equal(img, render(r2))


def test_static_frame_after_dynamic_keeps_updated_transforms():
    """A DYNAMIC frame (update_transforms -> one-dispatch inline-shadow
    program) followed by STATIC frames must keep rendering the UPDATED
    transforms: the deferred item.model writeback means the host mirror —
    not the stale DrawItems — is authoritative when the static path
    re-materializes the device model array."""
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(4, seed=30)
    r.submit_render_commands(commands(t0))
    render(r)
    t1 = [t.copy() for t in t0]
    for t in t1:
        t[:3, 3] += np.float32(0.8)
    r.update_transforms(np.stack(t1))
    img_dyn = render(r)  # dynamic path (deferred upload)
    img_static1 = render(r)  # static path re-materializes from the mirror
    img_static2 = render(r)  # shadow cache now hits
    want = fresh_image(t1)
    np.testing.assert_array_equal(img_dyn, want)
    np.testing.assert_array_equal(img_static1, want)
    np.testing.assert_array_equal(img_static2, want)


def test_sparse_update_then_static_frames_match():
    """Sparse dict update -> dynamic frame -> static frame parity."""
    r = make_renderer()
    register_mat(r)
    t0 = make_transforms(4, seed=31)
    r.submit_render_commands(commands(t0))
    render(r)
    t1 = [t.copy() for t in t0]
    t1[2][:3, 3] -= np.float32(1.2)
    r.update_transforms({2: t1[2]})
    img_dyn = render(r)
    img_static = render(r)
    want = fresh_image(t1)
    np.testing.assert_array_equal(img_dyn, want)
    np.testing.assert_array_equal(img_static, want)


def _random_trs(n, seed):
    rng = np.random.default_rng(seed)
    t = ((rng.random((n, 3), np.float32) - 0.5) * 4.0).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = (0.5 + rng.random((n, 3), np.float32)).astype(np.float32)
    return t, q, s


def test_update_transforms_trs_matches_matrix_path():
    """update_transforms_trs (device-composed matrices riding the consts
    buffer as 10 floats/draw) must be pixel-identical to
    update_transforms(mat4_trs_batch(...)) — the host/device composes use
    the same float op sequence."""
    from ash_tpu.core import maths

    t, q, s = _random_trs(4, seed=40)
    base = make_transforms(4, seed=41)

    r = make_renderer()
    register_mat(r)
    r.submit_render_commands(commands(base))
    render(r)
    r.update_transforms_trs(t, q, s)
    img_trs = render(r)  # dynamic TRS program
    img_static = render(r)  # static frame re-materializes from the mirror

    r2 = make_renderer()
    register_mat(r2)
    r2.submit_render_commands(commands(base))
    render(r2)
    r2.update_transforms(maths.mat4_trs_batch(t, q, s))
    img_mat = render(r2)  # dynamic matrix program

    np.testing.assert_array_equal(img_trs, img_mat)
    np.testing.assert_array_equal(img_static, img_mat)


def test_update_transforms_trs_uniform_scale_and_transitions():
    """(N,) uniform scales are accepted; a sparse MATRIX update after a TRS
    update must compose the stale mirror first (ensure-models-host)."""
    from ash_tpu.core import maths

    t, q, _ = _random_trs(3, seed=42)
    s1 = np.array([0.5, 1.0, 1.5], np.float32)

    r = make_renderer()
    register_mat(r)
    r.submit_render_commands(commands(make_transforms(3, seed=43)))
    render(r)
    r.update_transforms_trs(t, q, s1)
    render(r)
    # Sparse matrix edit of draw 1 on top of the TRS state.
    moved = np.eye(4, dtype=np.float32)
    moved[:3, 3] = [1.0, 0.2, -0.5]
    r.update_transforms({1: moved})
    img = render(r)

    full = maths.mat4_trs_batch(t, q, np.repeat(s1[:, None], 3, axis=1))
    expect = [full[0], moved, full[2]]
    np.testing.assert_array_equal(img, fresh_image(expect))


def test_update_transforms_trs_before_scene_build():
    """TRS update while the scene is still dirty composes on host and takes
    the general path (no built scene to ride the consts buffer of)."""
    from ash_tpu.core import maths

    t, q, s = _random_trs(3, seed=44)
    r = make_renderer()
    register_mat(r)
    r.submit_render_commands(commands(make_transforms(3, seed=45)))
    r.update_transforms_trs(t, q, s)  # scene not built yet
    img = render(r)
    np.testing.assert_array_equal(
        img, fresh_image(list(maths.mat4_trs_batch(t, q, s)))
    )
