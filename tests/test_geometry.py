"""Unit tests for the camera model and frame transforms (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.config import CameraConfig, SlamConfig
from cv_monoslam_tpu.geometry import camera as cam
from cv_monoslam_tpu.geometry import transforms as tf
from cv_monoslam_tpu.models.oracle import OracleCamera

CFG = SlamConfig()
CAM = CameraConfig()


def interior_points():
    return jnp.array([[320.0, 240.0], [50.0, 50.0], [600.0, 430.0],
                      [100.0, 400.0], [310.1, 236.8]])


def test_distort_undistort_roundtrip():
    pts = interior_points()
    rt = cam.undistort(CAM, cam.distort(CAM, pts))
    assert float(jnp.abs(rt - pts).max()) < 1e-6


def test_distort_matches_oracle_100_iterations():
    """Fixed 8 Newton iterations match the reference's 100
    (SLAM.cpp:3186-3193 converges in < 5 for this lens)."""
    oc = OracleCamera(CFG)
    for p in np.asarray(interior_points()):
        ju, jv = np.asarray(cam.distort(CAM, jnp.asarray(p)))
        ou, ov = oc.distort(p[0], p[1], iters=100)
        assert abs(ju - ou) < 1e-9 and abs(jv - ov) < 1e-9


def test_project_axis_convention():
    """camera2image pairs camera X with the row axis via (cx, f1) and Y with
    the column axis via (cy, f2) (SLAM.cpp:3338-3339)."""
    hlr = jnp.array([0.1, 0.2, 3.0])
    uv = cam.camera2image(CAM, hlr)
    assert abs(float(uv[0]) - (CAM.cy + CAM.f2 * 0.2 / 3.0)) < 1e-9  # u/col
    assert abs(float(uv[1]) - (CAM.cx + CAM.f1 * 0.1 / 3.0)) < 1e-9  # v/row


def test_project_sentinel_margin():
    """Points near the border collapse to (0, 0) (SLAM.cpp:3341-3345)."""
    # X/Z large -> v beyond height
    uv = cam.camera2image(CAM, jnp.array([2.0, 0.0, 3.0]))
    assert float(jnp.abs(uv).max()) == 0.0
    uv = cam.camera2image(CAM, jnp.array([0.0, 0.0, 0.0]))  # Z == 0 guard
    assert float(jnp.abs(uv).max()) == 0.0


def test_image2camera_inverts_camera2image():
    hlr = jnp.array([0.05, -0.08, 1.0])
    uv = cam.camera2image(CAM, hlr)
    back = cam.image2camera(CAM, uv)
    assert float(jnp.abs(back - hlr).max()) < 1e-9


def test_inverse_depth_roundtrip():
    feat = jnp.array([0.5, -0.3, 0.0, 0.2, -0.1, 0.31])
    xyz = tf.inverse_depth_to_cartesian(feat)
    hlw = xyz - feat[:3]
    ang = tf.world_to_angles(hlw)
    assert abs(float(ang[0]) - 0.2) < 1e-9
    assert abs(float(ang[1]) + 0.1) < 1e-9
    assert abs(float(jnp.linalg.norm(hlw)) - 1 / 0.31) < 1e-9


def test_cartesian_jacobian_matches_numeric():
    feat = np.array([0.5, -0.3, 0.1, 0.2, -0.1, 0.31])
    J = np.asarray(tf.cartesian_jacobian(jnp.asarray(feat)))
    eps = 1e-7
    for k in range(6):
        fp = feat.copy(); fp[k] += eps
        fm = feat.copy(); fm[k] -= eps
        num = (np.asarray(tf.inverse_depth_to_cartesian(jnp.asarray(fp)))
               - np.asarray(tf.inverse_depth_to_cartesian(jnp.asarray(fm)))
               ) / (2 * eps)
        assert np.abs(J[:, k] - num).max() < 1e-5


def test_yaw_matrix_orthonormal_and_wrap():
    th = jnp.array([0.3, -2.8, 3.5])
    R = tf.yaw_matrix(th)
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    assert float(jnp.abs(eye - jnp.eye(3)).max()) < 1e-12
    w = tf.wrap_angle(jnp.array([3.5, -4.0, 0.1]))
    assert float(jnp.abs(w).max()) <= np.pi


def test_quaternion_from_rotation():
    th = 0.7
    R = tf.yaw_matrix(jnp.asarray(th))
    q = np.asarray(tf.rotation_to_quaternion(R))
    assert abs(q[0] - np.cos(th / 2)) < 1e-9
    assert abs(q[3] - np.sin(th / 2)) < 1e-9
