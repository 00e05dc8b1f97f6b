"""Covariance-repair telemetry (VERDICT r2 item 7).

The escalating-jitter Cholesky repair (ops.linalg.chol_psd_flagged) and
the gram-update skip-update fallback used to be silent; the reference at
least printed its GMW interventions (SLAM.cpp:2197-2327). These tests pin
that (a) repairs are counted and surfaced per frame, (b) healthy runs
report ZERO repairs, and (c) the stress conditions that trigger repair
paths produce a nonzero count.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_monoslam_tpu.config import CameraConfig, SlamConfig
from cv_monoslam_tpu.filter.srukf import slam_step
from cv_monoslam_tpu.filter.state import init_state, replace
from cv_monoslam_tpu.ops.linalg import chol_psd_flagged

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_chol_psd_flag_semantics():
    a = np.random.default_rng(0).normal(size=(6, 6))
    pd = jnp.asarray(a @ a.T + 6 * np.eye(6))
    r, lvl = jax.jit(chol_psd_flagged, static_argnums=1)(pd, 1e-6)
    assert int(lvl) == 0
    assert np.all(np.isfinite(np.asarray(r)))
    # barely indefinite (the realistic failure: roundoff pushes a tiny
    # eigenvalue below zero) — the first jitter rung repairs it: level 1
    w, v = np.linalg.eigh(np.asarray(pd))
    w[0] = -1e-7 * w[-1]
    tiny = jnp.asarray((v * w) @ v.T)
    r, lvl = jax.jit(chol_psd_flagged, static_argnums=1)(tiny, 1e-6)
    assert int(lvl) == 1
    assert np.all(np.isfinite(np.asarray(r)))
    # strongly indefinite — needs the escalated rungs: level >= 2
    indef = jnp.asarray(a @ a.T - 0.2 * np.eye(6))
    r, lvl = jax.jit(chol_psd_flagged, static_argnums=1)(indef, 1e-6)
    assert int(lvl) >= 2
    assert np.all(np.isfinite(np.asarray(r)))


@pytest.mark.slow
def test_healthy_run_reports_no_escalations(tiny_sequence):
    """Healthy sequences: zero ESCALATED repairs and zero skipped
    updates. Minor first-rung floors are routine (the motion-predicted
    Gram right after feature init carries ~1e-11 eigenvalues even in
    f64 — a genuinely near-deterministic direction) and are reported,
    not asserted away."""
    from cv_monoslam_tpu.api import SlamSession

    seq, track, gt_xy, _ = tiny_sequence
    cfg = SlamConfig(max_landmarks=16, max_new_per_frame=8,
                     max_detections=32)
    s = SlamSession(cfg, seq, track)
    s.run()
    last = s.records[-1]
    assert last.n_escalations == 0, (
        f"{last.n_escalations} reset-grade repairs on a healthy run")
    assert last.n_skipped == 0
    # counters are monotone cumulative and visible per frame
    reps = [r.n_repairs for r in s.records]
    assert all(b >= a for a, b in zip(reps, reps[1:]))


def test_stress_state_reports_repairs():
    """A rank-deficient sqrt factor forces the gram paths through the
    jitter ladder; the counter must expose it."""
    cfg = SlamConfig(max_landmarks=8, max_new_per_frame=4,
                     max_detections=16, dtype="float32",
                     camera=CameraConfig(width=160, height=120,
                                         cx=80.0, cy=60.0))
    rng = np.random.default_rng(0)
    state = init_state(cfg)
    lm = state.lm
    n_act = 4
    lm.active[:n_act] = True
    lm.lid[:n_act] = np.arange(1, n_act + 1)
    for i in range(n_act):
        state.x[6 * i: 6 * i + 6] = [0, 0, 0, rng.normal(0, 0.3),
                                     rng.normal(0, 0.2), 1.0 / cfg.deep]
        lm.init_patch[i] = rng.uniform(0, 255, lm.init_patch.shape[1:])
    # near-singular S: duplicate rows -> Gram is rank-deficient
    S = np.asarray(state.S).copy()
    S[1] = S[0] * (1 + 1e-8)
    state = replace(state, S=jnp.asarray(S))

    img = rng.uniform(0, 255, (cfg.camera.height,
                               cfg.camera.width)).astype(np.float32)
    odo0 = np.zeros(3, np.float32)
    odo1 = np.array([0.03, 0.0, 0.01], np.float32)
    step = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, False, cfg))
    out = None
    for _ in range(3):
        state, out = step(state, img, odo0, odo1)
    reps = np.asarray(out["repairs"])
    assert np.all(np.isfinite(np.asarray(state.S)))
    assert reps[0] + reps[1] > 0, (
        "rank-deficient input should trip the repair path")
