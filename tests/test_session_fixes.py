"""Regression tests for session-level correctness (VERDICT round-1 items):
ate() frame-id indexing, stored-table oldest eviction, per-frame side
effects in the chunked fast path, refined-trajectory wiring."""

import numpy as np
import pytest

from cv_monoslam_tpu.api import FrameRecord, SlamSession
from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.filter.lifecycle import store_features
from cv_monoslam_tpu.filter.state import init_state
from cv_monoslam_tpu.io.dataset import OdometryTrack
from cv_monoslam_tpu.io.recording import RunRecorder, load_robot_path
from cv_monoslam_tpu.utils.watchdog import Watchdog


def _recs(stored_k, lid, stamp_like=None):
    """One StoredTable-shaped record batch with a single masked entry."""
    K = 1
    P = 21
    return dict(
        lid=np.array([lid], np.int32),
        is_loop=np.zeros(K, bool),
        n_predict=np.zeros(K, np.int32),
        n_match=np.zeros(K, np.int32),
        state=np.full((K, 6), float(lid)),
        sr=np.tile(np.eye(6), (K, 1, 1)),
        init_pixel=np.zeros((K, 2)),
        init_trans=np.zeros((K, 3)),
        init_theta=np.zeros(K),
        init_patch=np.zeros((K, P, P), np.float32),
        xyz=np.zeros((K, 3)),
    )


def test_store_features_evicts_oldest():
    cfg = SlamConfig(max_landmarks=4)
    st = init_state(cfg, max_stored=3).stored
    mask = np.array([True])
    for lid in (10, 11, 12):                    # fill the table
        st = store_features(st, _recs(st, lid), mask)
    assert np.asarray(st.valid).all()
    st = store_features(st, _recs(st, 13), mask)   # full -> evict oldest
    lids = set(np.asarray(st.lid).tolist())
    assert 10 not in lids, "oldest entry (lid 10) must be evicted"
    assert lids == {11, 12, 13}
    # lru order persists: next eviction removes lid 11
    st = store_features(st, _recs(st, 14), mask)
    assert set(np.asarray(st.lid).tolist()) == {12, 13, 14}


def test_store_features_dedupes_by_lid():
    cfg = SlamConfig(max_landmarks=4)
    st = init_state(cfg, max_stored=3).stored
    mask = np.array([True])
    for lid in (10, 11):
        st = store_features(st, _recs(st, lid), mask)
    recs = _recs(st, 10)
    recs["state"] = np.full((1, 6), 99.0)       # refreshed snapshot
    st = store_features(st, recs, mask)
    valid = np.asarray(st.valid)
    lids = np.asarray(st.lid)
    assert valid.sum() == 2, "re-store of an existing lid must not add a slot"
    row = np.flatnonzero(valid & (lids == 10))[0]
    assert np.allclose(np.asarray(st.state)[row], 99.0)


def test_ate_indexes_ground_truth_by_raw_frame_id():
    """gt arrays are indexed by raw frame id; when the min-step filter drops
    odometry rows the kept-row index diverges from the frame id
    (api.py round-1 bug: used r.frame directly)."""
    sess = object.__new__(SlamSession)
    # kept rows 0..3 map to raw frames 0, 2, 5, 9 (rows dropped in between)
    sess.track = OdometryTrack(
        frame_id=np.array([0, 2, 5, 9]),
        xy=np.zeros((4, 2)), theta=np.zeros(4),
        redirect=np.zeros(4, bool))
    sess.backend = None
    gt = np.zeros((10, 2))
    gt[[2, 5, 9]] = [[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]]
    sess.records = [
        FrameRecord(frame=k, pose=np.array([float(k), 0, 0, 0]),
                    pose_sqrt_cov=np.zeros(4), n_map=0, n_visible=0,
                    n_matched=0, redirected=False, wall_time=0.0)
        for k in (1, 2, 3)]
    # poses exactly equal gt at the raw ids -> ATE must be 0
    assert sess.ate(gt) == pytest.approx(0.0)


@pytest.mark.slow
def test_chunked_run_records_every_frame(tmp_path, tiny_sequence):
    seq, track, gt_xy, gt_th = tiny_sequence
    cfg = SlamConfig(max_landmarks=16, max_new_per_frame=8,
                     max_detections=32, dtype="float64")
    robot = str(tmp_path / "RobotPath.txt")
    rec = RunRecorder(robot_path=robot)
    wd = Watchdog(cfg, check_every=1)
    s = SlamSession(cfg, seq, track, recorder=rec, watchdog=wd)
    s.run(chunk=4)
    rec.close()
    rows = load_robot_path(robot)
    assert len(rows["frame"]) == len(s.records), \
        "chunked fast path must record every frame, not chunk tails"
    assert list(rows["frame"]) == [r.frame for r in s.records]
    # watchdog saw every frame's health flags (computed in-scan)
    assert wd.n_checks == len(s.records)
    assert wd.n_failures == 0


def test_refined_trajectory_identity_without_backend():
    sess = object.__new__(SlamSession)
    sess.backend = None
    sess.records = [
        FrameRecord(frame=k, pose=np.array([k * 1.0, 0, 0, 0.1 * k]),
                    pose_sqrt_cov=np.zeros(4), n_map=0, n_visible=0,
                    n_matched=0, redirected=False, wall_time=0.0)
        for k in range(3)]
    np.testing.assert_allclose(sess.trajectory_refined, sess.trajectory)


def test_refined_trajectory_applies_keyframe_correction():
    from cv_monoslam_tpu.backend.session import BackendSession, Keyframe

    cfg = SlamConfig()
    backend = BackendSession(cfg)
    # keyframe at frame 1: filter thought (1, 0, 0); BA corrected to
    # (1, 0.5, pi/2). Later frames must be re-anchored rigidly.
    kf = Keyframe(frame=1, pose=np.array([1.0, 0.0, 0.0]),
                  odo=np.zeros(3), lids=np.array([1]),
                  pixels=np.zeros((1, 2)), xyz=np.zeros((1, 3)))
    kf.pose = np.array([1.0, 0.5, np.pi / 2])
    backend.keyframes.append(kf)

    sess = object.__new__(SlamSession)
    sess.backend = backend
    sess.records = [
        FrameRecord(frame=k, pose=np.array([k * 1.0, 0, 0, 0.0]),
                    pose_sqrt_cov=np.zeros(4), n_map=0, n_visible=0,
                    n_matched=0, redirected=False, wall_time=0.0)
        for k in range(4)]
    out = sess.trajectory_refined
    # frame 0 precedes the keyframe: unchanged
    np.testing.assert_allclose(out[0], [0, 0, 0, 0])
    # frame 1 is the keyframe itself: exactly the refined pose
    np.testing.assert_allclose(out[1, [0, 1, 3]], [1.0, 0.5, np.pi / 2],
                               atol=1e-12)
    # frame 2 was +1 m along x in the kf frame -> now +1 m along y
    np.testing.assert_allclose(out[2, [0, 1]], [1.0, 1.5], atol=1e-12)
    np.testing.assert_allclose(out[2, 3], np.pi / 2, atol=1e-12)
