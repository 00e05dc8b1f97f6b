"""Pinhole + radial-distortion camera model (batched, JAX).

Reproduces the reference camera semantics (MonoSLAM/SLAM.cpp:3177-3420)
including its ceiling-mount axis convention, but as vectorized, jit-friendly
functions with fixed-iteration Newton distortion instead of the reference's
100-iteration loop (SLAM.cpp:3186-3193 — converges in < 5 for this lens).

Pixel convention used throughout this package: ``pix[..., 0]`` = u = column
index (width axis), ``pix[..., 1]`` = v = row index (height axis).

The reference maps camera coordinates to pixels as (SLAM.cpp:3338-3339):
    column u  =  cy + f2 * Y/Z        (stored in Point2d.x there)
    row    v  =  cx + f1 * X/Z        (stored in Point2d.y there)
and inverts identically (SLAM.cpp:3360-3363), i.e. camera X pairs with the
*row* axis through (cx, f1) and camera Y with the *column* axis through
(cy, f2). Radial distortion is centred at (cx on u, cy on v)
(SLAM.cpp:3181-3182). We reproduce exactly this self-consistent convention.

An out-of-view projection is encoded by the (0, 0) pixel sentinel, as in the
reference (SLAM.cpp:3206-3212, 3341-3345).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraConfig


def undistort(cam: CameraConfig, pix_d: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel -> undistorted pixel, closed form (SLAM.cpp:3224-3236)."""
    xd = (pix_d[..., 0] - cam.cx) * cam.dx
    yd = (pix_d[..., 1] - cam.cy) * cam.dy
    rd2 = xd * xd + yd * yd
    d = 1.0 + cam.k1 * rd2 + cam.k2 * rd2 * rd2
    return jnp.stack(
        [cam.cx + xd * d / cam.dx, cam.cy + yd * d / cam.dy], axis=-1
    )


def distort(cam: CameraConfig, pix_u: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel -> distorted pixel via Newton solve for r_d.

    Mirrors SLAM.cpp:3177-3213 (fixed ``cam.distort_iters`` Newton steps on
    f(rd) = rd + k1 rd^3 + k2 rd^5 - ru). Applies the same visibility
    sentinel: results outside [0, W] x [0, H] become (0, 0).
    """
    xu = (pix_u[..., 0] - cam.cx) * cam.dx
    yu = (pix_u[..., 1] - cam.cy) * cam.dy
    ru = jnp.sqrt(xu * xu + yu * yu)
    ru2 = ru * ru
    rd = ru / (1.0 + cam.k1 * ru2 + cam.k2 * ru2 * ru2)

    def newton(rd, _):
        f = rd + cam.k1 * rd**3 + cam.k2 * rd**5 - ru
        fp = 1.0 + 3.0 * cam.k1 * rd * rd + 5.0 * cam.k2 * rd**4
        return rd - f / fp, None

    rd, _ = jax.lax.scan(newton, rd, None, length=cam.distort_iters)
    rd2 = rd * rd
    d = 1.0 + cam.k1 * rd2 + cam.k2 * rd2 * rd2
    d = jnp.where(d == 0.0, 1e-13, d)
    u = cam.cx + (xu / d) / cam.dx
    v = cam.cy + (yu / d) / cam.dy
    visible = (u >= 0) & (u <= cam.width) & (v >= 0) & (v <= cam.height)
    return jnp.where(visible[..., None], jnp.stack([u, v], axis=-1), 0.0)


def camera2image(cam: CameraConfig, hlr: jnp.ndarray,
                 err: jnp.ndarray | None = None) -> jnp.ndarray:
    """Camera-frame point -> undistorted pixel (SLAM.cpp:3322-3349).

    ``hlr[..., :]`` = (X, Y, Z) in the camera frame. Applies the reference's
    axis pairing (u from Y via cy/f2, v from X via cx/f1), additive
    measurement-noise term ``err`` (shape (..., 2), u then v component), the
    10-px interior margin, and the Z==0 guard — all collapsing to the (0,0)
    sentinel.
    """
    X, Y, Z = hlr[..., 0], hlr[..., 1], hlr[..., 2]
    safe_z = jnp.where(Z == 0.0, 1.0, Z)
    u = cam.cy + cam.f2 * Y / safe_z
    v = cam.cx + cam.f1 * X / safe_z
    if err is not None:
        u = u + err[..., 0]
        v = v + err[..., 1]
    ok = (
        (Z != 0.0)
        & (u >= cam.margin) & (u <= cam.width - cam.margin)
        & (v >= cam.margin) & (v <= cam.height - cam.margin)
    )
    return jnp.where(ok[..., None], jnp.stack([u, v], axis=-1), 0.0)


def image2camera(cam: CameraConfig, pix_u: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel -> unit-Z camera ray (SLAM.cpp:3360-3372)."""
    X = (pix_u[..., 1] - cam.cx) / cam.f1
    Y = (pix_u[..., 0] - cam.cy) / cam.f2
    return jnp.stack([X, Y, jnp.ones_like(X)], axis=-1)


def project_smooth(cam: CameraConfig, hlr: jnp.ndarray) -> jnp.ndarray:
    """Sentinel-free differentiable projection for the BA backend.

    Same math as :func:`project` but without the visibility zeroing — the
    (0,0) sentinel is a step discontinuity whose derivative is zero, which
    would silently kill Gauss-Newton Jacobians. Validity is handled by the
    caller's observation mask instead.
    """
    X, Y, Z = hlr[..., 0], hlr[..., 1], hlr[..., 2]
    safe_z = jnp.where(jnp.abs(Z) < 1e-9, 1e-9, Z)
    u = cam.cy + cam.f2 * Y / safe_z
    v = cam.cx + cam.f1 * X / safe_z
    xu = (u - cam.cx) * cam.dx
    yu = (v - cam.cy) * cam.dy
    ru = jnp.sqrt(xu * xu + yu * yu + 1e-18)
    ru2 = ru * ru
    rd = ru / (1.0 + cam.k1 * ru2 + cam.k2 * ru2 * ru2)

    def newton(rd, _):
        f = rd + cam.k1 * rd**3 + cam.k2 * rd**5 - ru
        fp = 1.0 + 3.0 * cam.k1 * rd * rd + 5.0 * cam.k2 * rd**4
        return rd - f / fp, None

    rd, _ = jax.lax.scan(newton, rd, None, length=cam.distort_iters)
    rd2 = rd * rd
    d = 1.0 + cam.k1 * rd2 + cam.k2 * rd2 * rd2
    d = jnp.where(d == 0.0, 1e-13, d)
    return jnp.stack([cam.cx + (xu / d) / cam.dx,
                      cam.cy + (yu / d) / cam.dy], axis=-1)


def project(cam: CameraConfig, hlr: jnp.ndarray,
            err: jnp.ndarray | None = None) -> jnp.ndarray:
    """Camera-frame point -> distorted pixel, with sentinel propagation.

    Chains camera2image + distort; a (0,0) from the margin test stays (0,0)
    (the reference reaches the same result because distorting (0,0) leaves it
    near the border where the visibility check zeroes it again).
    """
    uvu = camera2image(cam, hlr, err)
    uvd = distort(cam, uvu)
    dead = jnp.all(uvu == 0.0, axis=-1)
    return jnp.where(dead[..., None], 0.0, uvd)
