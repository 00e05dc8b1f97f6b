"""Implicit sigma-point paths (sigma_mode="implicit") vs the full-tensor
paths — VERDICT r3 item 2 (large-state speed).

The implicit mode never materializes the (Na, 2Na+1) sigma tensor: motion
propagates only the three touched robot rows (exact — the same UT), the
measurement runs a 21-point UT in each landmark's exact 10-dim dependency
subspace (second-order equivalent), and the update rebuilds the
innovation structure from the implied linearization via Grams of S. These
tests pin the exact paths bitwise-close and bound the second-order ones.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.filter.measurement import measurement_predict
from cv_monoslam_tpu.filter.motion import motion_predict
from cv_monoslam_tpu.filter.state import init_state, replace
from cv_monoslam_tpu.filter.update import kalman_update

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

CFG_FULL = dict(max_landmarks=12, max_new_per_frame=4, max_detections=16,
                dtype="float64", qr_mode="gram", update_mode="gram")


def _populated_state(cfg, seed=0, n_act=8):
    """Random but realistic filter state: in-view landmarks, converged-
    filter covariance scale (pixel-level pose sigma). Huge covariances
    put the UT in the sentinel-mixing regime where NO sigma rule is
    meaningful; a working filter never lives there."""
    import jax.numpy as _jnp

    from cv_monoslam_tpu.geometry import camera as cam_mod
    from cv_monoslam_tpu.geometry import transforms as tf

    rng = np.random.default_rng(seed)
    state = init_state(cfg)
    lm = state.lm
    lm.active[:n_act] = True
    lm.lid[:n_act] = np.arange(1, n_act + 1)
    x = state.x
    x[-4:] = [0.3, -0.2, 0.0, 0.4]
    # place landmarks by BACK-PROJECTING interior pixels (so predictions
    # land well inside the image: the interior-only comparisons below
    # need several non-border landmarks)
    cam = cfg.camera
    pix = np.stack([
        cam.cx + rng.uniform(-130, 130, n_act),
        cam.cy + rng.uniform(-110, 110, n_act)], axis=1)
    uv_u = np.asarray(cam_mod.undistort(cam, _jnp.asarray(pix)))
    ray = np.asarray(cam_mod.image2camera(cam, _jnp.asarray(uv_u)))
    rwc = np.asarray(tf.yaw_matrix(_jnp.asarray(0.4)))
    ang = np.asarray(tf.world_to_angles(_jnp.asarray(ray @ rwc.T)))
    for i in range(n_act):
        x[6 * i: 6 * i + 6] = [0.3, -0.2, 0.0, ang[i, 0], ang[i, 1],
                               1.0 / cfg.deep]
    D = cfg.state_dim
    A = rng.normal(0, 0.002, (D, D))
    S = np.triu(A) + np.diag(rng.uniform(0.004, 0.02, D))
    return replace(state, S=jnp.asarray(S))


ODO = (np.array([0.0, 0.0, 0.1]), np.array([0.05, 0.01, 0.14]))


def _pair(seed=0):
    cfg_f = SlamConfig(**CFG_FULL)
    cfg_i = SlamConfig(**CFG_FULL, sigma_mode="implicit")
    return cfg_f, cfg_i, _populated_state(cfg_f, seed)


def test_implicit_motion_matches_full():
    cfg_f, cfg_i, state = _pair()
    sf, _ = motion_predict(state, jnp.asarray(ODO[0]), jnp.asarray(ODO[1]),
                           cfg_f)
    si_, ci = motion_predict(state, jnp.asarray(ODO[0]), jnp.asarray(ODO[1]),
                             cfg_i)
    np.testing.assert_allclose(np.asarray(si_.x), np.asarray(sf.x),
                               rtol=0, atol=1e-12)
    # implicit motion defers the factorization: the predicted covariance
    # GRAM must equal the full path's S^T S
    Pf = np.asarray(sf.S).T @ np.asarray(sf.S)
    Pi = np.asarray(ci.g_pred)
    np.testing.assert_allclose(Pi, Pf, rtol=0, atol=1e-11)


def test_reduced_measurement_close_to_full():
    cfg_f, cfg_i, state = _pair()
    odo = (jnp.asarray(ODO[0]), jnp.asarray(ODO[1]))
    sf, cf = motion_predict(state, *odo, cfg_f)
    sf, cf = measurement_predict(sf, cf, cfg_f)
    si_, ci = motion_predict(state, *odo, cfg_i)
    si_, ci = measurement_predict(si_, ci, cfg_i)

    act = np.asarray(state.lm.active)
    vf = np.asarray(sf.lm.visible)
    vi = np.asarray(si_.lm.visible)
    np.testing.assert_array_equal(vi[act], vf[act])
    # compare INTERIOR landmarks only: near the border the full path's
    # sigma projections mix (0,0) sentinels into the mean (a documented
    # bias of the reference structure), while the reduced path's sentinel
    # guard replaces dead points with the centre projection — the two
    # intentionally disagree exactly there (see measurement_predict_reduced)
    pf_all = np.asarray(sf.lm.pred)
    interior = ((pf_all[:, 0] > 60) & (pf_all[:, 0] < 580)
                & (pf_all[:, 1] > 60) & (pf_all[:, 1] < 420))
    sel = act & vf & interior
    assert sel.sum() >= 2, "fixture leaves too few interior landmarks"
    # predicted pixels: both are valid UTs of the same marginal; they
    # differ in higher-order terms which the Murray scheme AMPLIFIES at
    # large Na (its center mean-weight is 1 - Na/3 ~ -24 here, vs -2.3
    # for the 10-dim UT). Sub-half-pixel agreement — well under the 3 px
    # measurement noise — is the meaningful bound.
    pf = np.asarray(sf.lm.pred)[sel]
    pi = np.asarray(si_.lm.pred)[sel]
    assert np.abs(pf - pi).max() < 0.5, np.abs(pf - pi).max()
    # innovation sqrt: same scale
    sif = np.asarray(sf.lm.si)[sel]
    sii = np.asarray(si_.lm.si)[sel]
    ref = np.abs(sif).max()
    assert np.abs(sif - sii).max() < 0.05 * ref + 0.2


def test_implicit_update_posterior_close():
    cfg_f, cfg_i, state = _pair()
    odo = (jnp.asarray(ODO[0]), jnp.asarray(ODO[1]))

    outs = {}
    for name, cfg in (("full", cfg_f), ("imp", cfg_i)):
        s, c = motion_predict(state, *odo, cfg)
        s, c = measurement_predict(s, c, cfg)
        # synthetic matches: observed = predicted + fixed offset.
        # INTERIOR landmarks only — near the border the two paths'
        # predictions intentionally differ (sentinel guard, see
        # test_reduced_measurement_close_to_full)
        lm = s.lm
        interior = ((lm.pred[:, 0] > 60) & (lm.pred[:, 0] < 580)
                    & (lm.pred[:, 1] > 60) & (lm.pred[:, 1] < 420))
        matched = lm.visible & lm.active & interior
        match_px = lm.pred + jnp.where(
            matched[:, None], jnp.asarray([1.5, -2.0]), 0.0)
        s = replace(s, lm=replace(lm, matched=matched, match_px=match_px))
        outs[name] = kalman_update(s, c, cfg)

    xf, xi = np.asarray(outs["full"].x), np.asarray(outs["imp"].x)
    dxf = xf - np.asarray(state.x)
    # the update step agrees to the linearization order: relative error of
    # the state correction under 2%
    denom = np.abs(dxf).max() + 1e-12
    assert np.abs(xi - xf).max() / denom < 2e-2, (
        np.abs(xi - xf).max() / denom)
    # posterior covariance: the full path's innovation deviations carry
    # the UT's quadratic terms (Murray-amplified); the implicit path is
    # their statistical linearization. Individual entries can differ by
    # ~20% of the largest entry while the state corrections above agree
    # to 2% — the e2e test + engine-vs-oracle ATE bands are the
    # trajectory-level guarantee.
    Pf = np.asarray(outs["full"].S).T @ np.asarray(outs["full"].S)
    Pi = np.asarray(outs["imp"].S).T @ np.asarray(outs["imp"].S)
    assert np.abs(Pi - Pf).max() / (np.abs(Pf).max() + 1e-12) < 0.3


@pytest.mark.slow
def test_implicit_end_to_end_tracks():
    """Full pipeline in implicit mode stays accurate on a real sequence."""
    from experiment import get_sequence
    from cv_monoslam_tpu.api import SlamSession

    seq, track, gt_xy, _ = get_sequence("arc", 20, 0)
    cfg_f = SlamConfig(max_landmarks=16, max_new_per_frame=8,
                       max_detections=32, dtype="float64")
    cfg_i = SlamConfig(max_landmarks=16, max_new_per_frame=8,
                       max_detections=32, dtype="float64",
                       sigma_mode="implicit")
    ate = {}
    for name, cfg in (("full", cfg_f), ("imp", cfg_i)):
        s = SlamSession(cfg, seq, track)
        s.run()
        assert len(s.records) == len(track) - 1
        assert s.records[-1].n_map >= 3
        ate[name] = s.ate(gt_xy)
    # implicit must track comparably (both are valid UTs of the same
    # model; neither is "the truth" — bound the gap, not the sign)
    assert ate["imp"] < max(2.0 * ate["full"], 0.02), ate
