"""Numerical-robustness stress tests (SURVEY.md §4 item 3, VERDICT item 10).

Injects the reference's known failure modes into the jitted step — the
conditions its PD-failure guards exist for (GSL Cholesky error check
SLAM.cpp:3855-3860, Gill-Murray-Wright fallback 2197-2327, deletion rules
2443-2459) — and asserts the engine's repair paths keep the filter finite
and the watchdog recovers what can't be repaired.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_monoslam_tpu.config import CameraConfig, SlamConfig
from cv_monoslam_tpu.filter.srukf import slam_step
from cv_monoslam_tpu.filter.state import init_state, replace
from cv_monoslam_tpu.utils.watchdog import Watchdog, health_check


def _cfg(**kw):
    kw.setdefault("max_landmarks", 8)
    kw.setdefault("max_new_per_frame", 4)
    kw.setdefault("max_detections", 16)
    kw.setdefault("dtype", "float32")
    kw.setdefault("camera", CameraConfig(width=160, height=120,
                                         cx=80.0, cy=60.0))
    return SlamConfig(**kw)


def _state(cfg, seed=0, n_act=4, rho=None):
    rng = np.random.default_rng(seed)
    state = init_state(cfg)
    lm = state.lm
    lm.active[:n_act] = True
    lm.lid[:n_act] = np.arange(1, n_act + 1)
    x = state.x
    for i in range(n_act):
        r = (1.0 / cfg.deep) if rho is None else rho
        x[6 * i: 6 * i + 6] = [0.0, 0.0, 0.0, rng.normal(0, 0.3),
                               rng.normal(0, 0.2), r]
        lm.init_patch[i] = rng.uniform(0, 255, lm.init_patch.shape[1:])
    return state


def _step(cfg):
    return jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, False, cfg))


def _img(cfg, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (cfg.camera.height,
                                cfg.camera.width)).astype(np.float32)


ODO = (np.zeros(3, np.float32), np.array([0.03, 0.0, 0.01], np.float32))


@pytest.mark.parametrize("qr_mode", ["householder", "gram"])
def test_near_singular_sqrt_factor(qr_mode):
    """S with a collapsed diagonal entry must not poison the step — the
    repair path (jitter / GMW analogue) keeps everything finite."""
    cfg = _cfg(qr_mode=qr_mode)
    state = _state(cfg)
    S = np.array(state.S)
    S[3, 3] = 1e-12                       # collapsed direction
    S[0, 0] = 1e-9
    state = replace(state, S=S)
    new_state, out = _step(cfg)(state, _img(cfg), *ODO)
    assert np.isfinite(np.asarray(new_state.x)).all()
    assert np.isfinite(np.asarray(new_state.S)).all()
    assert np.asarray(out["health"]).all()


def test_negative_rho_landmark_deleted():
    """rho < 0 (behind-camera depth) triggers the deletion rule
    (SLAM.cpp:2443-2459) instead of breaking projection."""
    cfg = _cfg()
    state = _state(cfg, rho=-0.05)
    new_state, out = _step(cfg)(state, _img(cfg), *ODO)
    assert np.isfinite(np.asarray(new_state.x)).all()
    # every negative-depth landmark is gone (fresh detections may add new)
    feats = np.asarray(new_state.x)[: 6 * cfg.max_landmarks].reshape(-1, 6)
    act = np.asarray(new_state.lm.active)
    assert (feats[act, 5] > 0).all()


def test_empty_match_streak_stays_finite():
    """Frames with zero NCC matches (blank images) for several steps: the
    update must be an exact no-op and detection keeps re-seeding."""
    cfg = _cfg()
    state = _state(cfg)
    step = _step(cfg)
    blank = np.zeros((cfg.camera.height, cfg.camera.width), np.float32)
    for k in range(4):
        state, out = step(state, blank, *ODO)
        assert np.isfinite(np.asarray(state.x)).all()
        assert int(out["n_matched"]) == 0
    assert np.asarray(out["health"]).all()


def test_nan_image_detected_and_recovered():
    """A NaN image poisons matching/detection; the health flags catch it
    and the watchdog reset restores a finite filter preserving stored
    features."""
    cfg = _cfg()
    state = _state(cfg)
    step = _step(cfg)
    img = _img(cfg)
    img[40:60, 50:90] = np.nan
    state, out = step(state, img, *ODO)
    health = np.asarray(out["health"])
    x_bad = not np.isfinite(np.asarray(state.x)).all()
    if not x_bad and health.all():
        pytest.skip("NaN image did not propagate on this path")
    wd = Watchdog(cfg)
    report = wd.check_flags(health)
    state2 = wd.recover(state, 0.0)
    assert np.isfinite(np.asarray(state2.x)).all()
    assert np.isfinite(np.asarray(state2.S)).all()
    flags2 = np.asarray(health_check(state2, cfg))
    assert flags2.all()


def test_nan_state_detected_and_recovered():
    """NaN already in the filter state (the unrecoverable case) trips the
    health flags and the watchdog reset."""
    cfg = _cfg()
    state = _state(cfg)
    x = np.array(state.x)
    x[2] = np.nan
    S = np.array(state.S)
    S[5, 5] = np.inf
    state = replace(state, x=x, S=S)
    new_state, out = _step(cfg)(state, _img(cfg), *ODO)
    health = np.asarray(out["health"])
    assert not health.all()
    wd = Watchdog(cfg)
    wd.check_flags(health)
    assert wd.n_failures == 1
    state2 = wd.recover(new_state, 0.3)
    flags2 = np.asarray(health_check(state2, cfg))
    assert flags2.all()
    assert float(np.asarray(state2.x)[-1]) == pytest.approx(0.3)


def test_sequential_update_indefinite_downdate():
    """The stale sequential update's indefinite downdates (the reason the
    reference has GMW at all) stay finite in both downdate modes."""
    for mode in ("hyperbolic", "gmw"):
        cfg = _cfg(update_mode="sequential", downdate_mode=mode,
                   dtype="float64")
        state = _state(cfg)
        new_state, out = _step(cfg)(state, _img(cfg), *ODO)
        assert np.isfinite(np.asarray(new_state.S)).all(), mode
        d = np.abs(np.diag(np.asarray(new_state.S)))
        assert (d > 0).all(), mode
