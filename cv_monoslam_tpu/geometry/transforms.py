"""Frame transforms, inverse-depth parameterization, display math (JAX).

Covers the reference's coordinate machinery (MonoSLAM/SLAM.cpp:1031-1037,
3250-3420, 2721-2948) as batched functional ops.

State layout (per reference SLAM.h:271, SLAM.cpp:1184): a landmark is the
6-vector (x, y, z, theta, phi, rho) — anchor position, azimuth, elevation,
inverse depth; the robot pose is the 4-vector (x, y, z, theta).
"""

from __future__ import annotations

import jax.numpy as jnp


def yaw_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """World-from-camera yaw-only rotation R_wc (SLAM.cpp:1031-1037).

    Batched: theta (...,) -> (..., 3, 3).
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi] — single-branch version of SLAM.cpp:507-519."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def ray_from_angles(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Unit-ish direction m(theta, phi) used by inverse depth
    (SLAM.cpp:3270-3276): (cos(phi) sin(theta), -sin(phi), cos(phi) cos(theta))."""
    cp = jnp.cos(phi)
    return jnp.stack(
        [cp * jnp.sin(theta), -jnp.sin(phi), cp * jnp.cos(theta)], axis=-1
    )


def state_to_world(feat6: jnp.ndarray, cam_pos: jnp.ndarray) -> jnp.ndarray:
    """Inverse-depth landmark -> camera-to-landmark vector in world frame.

    Hlw = anchor + m(theta, phi)/rho - cam_pos (SLAM.cpp:3250-3278).
    feat6: (..., 6); cam_pos: (..., 3) -> (..., 3).
    """
    anchor = feat6[..., 0:3]
    theta, phi, rho = feat6[..., 3], feat6[..., 4], feat6[..., 5]
    safe_rho = jnp.where(rho == 0.0, 1e-13, rho)
    m = ray_from_angles(theta, phi)
    return anchor + m / safe_rho[..., None] - cam_pos


def world_to_angles(hlw: jnp.ndarray) -> jnp.ndarray:
    """Direction vector -> (theta, phi) (SLAM.cpp:3398-3420):
    theta = atan2(x, z); phi = atan2(-y, sqrt(x^2 + z^2))."""
    x, y, z = hlw[..., 0], hlw[..., 1], hlw[..., 2]
    theta = jnp.arctan2(x, z)
    phi = jnp.arctan2(-y, jnp.sqrt(x * x + z * z))
    return jnp.stack([theta, phi], axis=-1)


def world_to_camera(hlw: jnp.ndarray, rcw: jnp.ndarray) -> jnp.ndarray:
    """Rotate world vector into camera frame (SLAM.cpp:3290-3310)."""
    return jnp.einsum("...ij,...j->...i", rcw, hlw)


def camera_to_world(hlr: jnp.ndarray, rwc: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", rwc, hlr)


def inverse_depth_to_cartesian(feat6: jnp.ndarray) -> jnp.ndarray:
    """Landmark 6-state -> world xyz (SLAM.cpp:2721-2751, 2766-2778)."""
    anchor = feat6[..., 0:3]
    theta, phi, rho = feat6[..., 3], feat6[..., 4], feat6[..., 5]
    safe_rho = jnp.where(rho == 0.0, 1e-13, rho)
    return anchor + ray_from_angles(theta, phi) / safe_rho[..., None]


def cartesian_jacobian(feat6: jnp.ndarray) -> jnp.ndarray:
    """d(xyz)/d(feat6) analytic Jacobian, (..., 3, 6) (SLAM.cpp:2743-2748)."""
    theta, phi, rho = feat6[..., 3], feat6[..., 4], feat6[..., 5]
    safe_rho = jnp.where(rho == 0.0, 1e-13, rho)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    r = safe_rho
    r2 = r * r
    batch = jnp.broadcast_shapes(theta.shape)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=feat6.dtype), (*batch, 3, 3))
    dang = jnp.stack(
        [
            jnp.stack([cp * ct / r, -sp * st / r, -cp * st / r2], axis=-1),
            jnp.stack([jnp.zeros_like(r), -cp / r, sp / r2], axis=-1),
            jnp.stack([-cp * st / r, -sp * ct / r, -cp * ct / r2], axis=-1),
        ],
        axis=-2,
    )
    return jnp.concatenate([eye, dang], axis=-1)


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation -> quaternion (w, x, y, z), branch-free
    (reference: SLAM.cpp:2903-2948 uses the max-trace branch ladder; we use
    the numerically-safe all-branch formulation and pick the best)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
    denom = jnp.where(qw < 1e-6, 1.0, 4.0 * qw)
    qx = (m21 - m12) / denom
    qy = (m02 - m20) / denom
    qz = (m10 - m01) / denom
    return jnp.stack([qw, qx, qy, qz], axis=-1)


def covariance_ellipsoid(cov3: jnp.ndarray):
    """1-sigma ellipsoid axes + orientation quaternion from a 3x3 covariance
    (SLAM.cpp:2791-2802, 2815-2948). Returns (sigma (...,3), quat (...,4))."""
    w, v = jnp.linalg.eigh(cov3)
    sigma = jnp.sqrt(jnp.maximum(w, 0.0))
    return sigma, rotation_to_quaternion(v)
