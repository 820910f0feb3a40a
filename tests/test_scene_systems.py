"""Scene-management systems: LOD, instancing, occlusion host state, CSM.

Ports the reference's own unit tests for these modules (SURVEY §4):
CSM split monotonicity + cascade validity (shadow.rs:344-389), LOD screen
coverage/reduction (lod_system.rs:365-394), instancing batching
(instancing.rs:292-334), AABB construction (occlusion_culling.rs:286-315).
"""

import numpy as np

from ash_tpu.core import maths
from ash_tpu.render.csm import MAX_CASCADES, CascadedShadowMap, CsmConfig
from ash_tpu.render.instancing import (
    MAX_INSTANCES_PER_BATCH,
    InstanceData,
    InstancingManager,
)
from ash_tpu.render.lod_system import (
    LodConfig,
    LodLevel,
    LodManager,
    LodMesh,
    screen_coverage,
    screen_coverage_batch,
)
from ash_tpu.render.occlusion_culling import (
    CullBoundingBox,
    CullObjectData,
    OcclusionCullingSystem,
)


# ----------------------------------------------------------------- CSM


def test_csm_split_monotonicity():
    """shadow.rs:348-358."""
    csm = CascadedShadowMap(CsmConfig())
    splits = csm.calculate_splits(0.1, 100.0)
    assert splits[0] == np.float32(0.1)
    assert splits[1] < splits[2] < splits[3] < splits[4] <= 100.0


def test_csm_cascade_update():
    """shadow.rs:361-379."""
    csm = CascadedShadowMap(CsmConfig())
    view = maths.look_at_rh([0, 5, 10], [0, 0, 0], [0, 1, 0])
    proj = maths.perspective_rh(np.deg2rad(45), 16 / 9, 0.1, 100.0)
    csm.update(view, proj, np.array([-0.5, -1.0, -0.3]) / np.linalg.norm([-0.5, -1, -0.3]), 50.0)
    for i in range(4):
        assert not np.allclose(csm.light_matrix(i), np.eye(4))
    gpu = csm.gpu_data()
    assert gpu.params[0] == 4.0
    assert gpu.light_matrices.shape == (MAX_CASCADES, 4, 4)
    # Split distances ascend.
    assert np.all(np.diff(gpu.split_distances) > 0)


def test_csm_presets():
    """shadow.rs:382-389."""
    assert CsmConfig.high_quality().resolution == 4096
    assert CsmConfig.performance().cascade_count == 2


# ----------------------------------------------------------------- LOD


def _vp():
    view = maths.look_at_rh([0, 0, 10], [0, 0, 0], [0, 1, 0])
    proj = maths.perspective_rh(np.deg2rad(45), 1.0, 0.1, 100.0)
    return proj @ view


def test_screen_coverage_distance_falloff():
    """lod_system.rs:365-377: nearer -> more coverage; behind camera -> 0."""
    vp = _vp()
    near = screen_coverage([0, 0, 5], 1.0, vp, 1920, 1080)
    far = screen_coverage([0, 0, -50], 1.0, vp, 1920, 1080)
    assert near > far > 0
    assert screen_coverage([0, 0, 20], 1.0, vp, 1920, 1080) == 0.0


def test_screen_coverage_batch_matches_scalar():
    vp = _vp()
    pos = np.array([[0, 0, 5], [0, 0, 0], [3, 1, -20]], np.float32)
    radii = np.array([1.0, 2.0, 0.5], np.float32)
    batch = screen_coverage_batch(pos, radii, vp, 640, 480)
    for i in range(3):
        np.testing.assert_allclose(
            batch[i],
            screen_coverage(pos[i], float(radii[i]), vp, 640, 480),
            rtol=1e-5,
        )


def test_lod_selection_and_reduction_rate():
    """lod_system.rs:379-394 spirit: big object -> LOD0, small -> lower."""
    mgr = LodManager(LodConfig(smooth_transitions=False))
    mesh = LodMesh(
        name="m",
        levels=[
            LodLevel(screen_threshold=0.1, triangle_count=1000),
            LodLevel(screen_threshold=0.01, triangle_count=250),
            LodLevel(screen_threshold=0.0, triangle_count=60),
        ],
    )
    vp = _vp()
    near = mgr.select_lod(mesh, [0, 0, 8], vp, [0, 0, 10], 800, 600)
    far = mgr.select_lod(mesh, [0, 0, -10], vp, [0, 0, 10], 800, 600)
    assert near.level < far.level
    assert not near.culled
    stats = mgr.stats
    assert stats.triangles_before == 2000
    assert 0.0 < stats.reduction_rate < 1.0


def test_lod_cull_threshold():
    mgr = LodManager()
    mesh = LodMesh("m", [LodLevel(screen_threshold=0.0, triangle_count=10)])
    vp = _vp()
    sel = mgr.select_lod(mesh, [0, 0, -4000], vp, [0, 0, 10], 800, 600)
    assert sel.culled and mgr.stats.objects_culled == 1


# ----------------------------------------------------------------- instancing


def test_instancing_batches_by_key():
    """instancing.rs:292-334."""
    mgr = InstancingManager()
    m = np.eye(4, dtype=np.float32)
    assert mgr.add_instance(1, 1, InstanceData(model=m))
    assert mgr.add_instance(1, 1, InstanceData(model=maths.mat4_translation([5, 0, 0])))
    assert mgr.add_instance(2, 1, InstanceData(model=m))
    stats = mgr.stats()
    assert stats.total_instances == 3
    assert stats.batch_count == 2
    assert stats.draw_calls_saved == 1
    batch = mgr.batches[(1, 1)]
    assert batch.packed().shape == (2, 24)
    np.testing.assert_allclose(batch.bounds_max, [5, 0, 0])


def test_instance_data_flat_layout():
    inst = InstanceData(model=maths.mat4_translation([1, 2, 3]))
    flat = inst.flat()
    assert flat.shape == (24,)
    assert flat[3] == 1.0 and flat[7] == 2.0 and flat[11] == 3.0  # row-major T


# ----------------------------------------------------------------- occlusion host


def test_cull_bounding_box():
    """occlusion_culling.rs:286-303."""
    bb = CullBoundingBox.from_min_max([-1, -2, -3], [1, 2, 3])
    np.testing.assert_allclose(bb.center, [0, 0, 0])
    np.testing.assert_allclose(bb.extents, [1, 2, 3])
    corners = bb.corners()
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [-1, -2, -3])


def test_occlusion_system_pack_and_stats():
    sys = OcclusionCullingSystem()
    for i in range(3):
        sys.register(
            CullObjectData(
                bounds=CullBoundingBox.from_min_max([-1, -1, -1], [1, 1, 1]),
                model=maths.mat4_translation([i * 3.0, 0, 0]),
                draw_index=i,
            )
        )
    c, e, m, en = sys.packed()
    assert c.shape == (3, 3) and m.shape == (3, 4, 4) and en.all()
    stats = sys.record_result(np.array([1, 0, 1]))
    assert stats.visible == 2
    assert abs(stats.culled_fraction - 1 / 3) < 1e-6
