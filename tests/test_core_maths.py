"""Core math tests: matrix conventions must match the reference (glam).

Expected values below were derived analytically from glam's documented
definitions of look_at_rh / perspective_rh (0..1 depth) / orthographic_rh,
which the reference uses (src/renderer/resources/transform.rs:102-114).
"""

import numpy as np
import pytest

from ash_tpu.core import maths
from ash_tpu.core.transform import MVP, Camera, Transform


def test_look_at_rh_basis():
    # Camera at +Z looking at origin: view maps world +Z to view -Z.
    view = maths.look_at_rh([0, 0, 3], [0, 0, 0], [0, 1, 0])
    p = maths.transform_point(view, [0, 0, 0])
    np.testing.assert_allclose(p, [0, 0, -3], atol=1e-6)
    # Right-handed: world +X stays +X, +Y stays +Y.
    np.testing.assert_allclose(
        maths.transform_point(view, [1, 0, 0]), [1, 0, -3], atol=1e-6
    )
    np.testing.assert_allclose(
        maths.transform_point(view, [0, 1, 0]), [0, 1, -3], atol=1e-6
    )


def test_perspective_rh_depth_range_zero_to_one():
    near, far = 0.5, 100.0
    proj = maths.perspective_rh(np.deg2rad(45.0), 16 / 9, near, far)
    # Point on the near plane (view z = -near) -> ndc z = 0.
    p_near = proj @ np.array([0, 0, -near, 1], np.float32)
    assert abs(p_near[2] / p_near[3]) < 1e-6
    # Point on the far plane -> ndc z = 1.
    p_far = proj @ np.array([0, 0, -far, 1], np.float32)
    np.testing.assert_allclose(p_far[2] / p_far[3], 1.0, atol=1e-5)


def test_orthographic_rh_depth_range():
    proj = maths.orthographic_rh(-10, 10, -10, 10, 0.1, 40.0)
    p_near = proj @ np.array([0, 0, -0.1, 1], np.float32)
    p_far = proj @ np.array([0, 0, -40.0, 1], np.float32)
    assert abs(p_near[2]) < 1e-6
    np.testing.assert_allclose(p_far[2], 1.0, atol=1e-6)
    # XY map linearly to [-1, 1].
    p = proj @ np.array([10, -10, -1, 1], np.float32)
    np.testing.assert_allclose(p[:2], [1, -1], atol=1e-6)


def test_camera_vulkan_y_flip():
    """transform.rs:108-114: proj.y_axis.y *= -1."""
    cam = Camera.default(aspect=16 / 9)
    proj = cam.projection_matrix()
    plain = maths.perspective_rh(np.deg2rad(45.0), 16 / 9, 0.5, 100.0)
    np.testing.assert_allclose(proj[1, 1], -plain[1, 1])
    np.testing.assert_allclose(proj[0, 0], plain[0, 0])


def test_camera_defaults_match_reference():
    """transform.rs:76-86."""
    cam = Camera.default(aspect=2.0)
    np.testing.assert_allclose(cam.position, [0, 0, 3])
    np.testing.assert_allclose(cam.target, [0, 0, 0])
    assert cam.fov == 45.0 and cam.near == 0.5 and cam.far == 100.0


def test_transform_trs_order():
    """transform.rs:22-26: T * R * S."""
    t = Transform()
    t.position = np.array([1, 2, 3], np.float32)
    t.scale = np.array([2, 2, 2], np.float32)
    m = t.model_matrix()
    np.testing.assert_allclose(
        maths.transform_point(m, [1, 0, 0]), [3, 2, 3], atol=1e-6
    )


def test_transform_rotate_euler():
    t = Transform()
    t.set_rotation([0.0, np.pi / 2, 0.0])
    m = t.model_matrix()
    # +Z rotates to +X under yaw of +90 deg (right-handed, Y up).
    np.testing.assert_allclose(
        maths.transform_point(m, [0, 0, 1]), [1, 0, 0], atol=1e-6
    )


def test_mvp_combined():
    model = maths.mat4_translation([1, 0, 0])
    view = maths.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    proj = maths.perspective_rh(np.deg2rad(60), 1.0, 0.1, 10.0)
    mvp = MVP(model, view, proj)
    np.testing.assert_allclose(mvp.combined(), proj @ view @ model, atol=1e-6)


def test_normal_matrix_inverse_transpose():
    m = maths.mat4_scale([2.0, 1.0, 1.0])
    nm = maths.normal_matrix(m)
    # A normal of an x-scaled surface must be inverse-scaled in x.
    n = nm[:3, :3] @ np.array([1, 0, 0], np.float32)
    np.testing.assert_allclose(n, [0.5, 0, 0], atol=1e-6)


def test_halton_sequence_values():
    """Halton(1..4, 2) = 1/2, 1/4, 3/4, 1/8; base 3: 1/3, 2/3, 1/9 ..."""
    assert maths.halton(1, 2) == pytest.approx(0.5)
    assert maths.halton(2, 2) == pytest.approx(0.25)
    assert maths.halton(3, 2) == pytest.approx(0.75)
    assert maths.halton(1, 3) == pytest.approx(1 / 3, rel=1e-6)
    assert maths.halton(2, 3) == pytest.approx(2 / 3, rel=1e-6)


def test_quat_axis_angle_roundtrip():
    q = maths.quat_from_axis_angle([0, 0, 1], np.pi / 2)
    m = maths.mat4_from_quat(q)
    np.testing.assert_allclose(
        maths.transform_point(m, [1, 0, 0]), [0, 1, 0], atol=1e-6
    )
