"""Loop-closure pipeline tests (BASELINE config 4; VERDICT r2 item 1).

Covers the drift-invariant constellation place recognition, the rebase
semantics that keep window BA consistent after a pose-graph commit, and
the full live pipeline: filter -> keyframes -> loop edge -> graph ->
refined trajectory on a genuine-revisit sequence. The reference's only
loop mechanism is the redirection splice (SLAM.cpp:948-1015); the graph
backend generalizes it, and these tests fail if loop detection regresses
to "machinery that never fires" (the round-2 state).
"""

import os
import sys

import numpy as np
import pytest

from cv_monoslam_tpu.backend.session import (BackendSession, Keyframe,
                                             _constellation_align)
from cv_monoslam_tpu.config import SlamConfig

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _rigid(dth, t, xy):
    c, s = np.cos(dth), np.sin(dth)
    return np.stack([c * xy[:, 0] - s * xy[:, 1] + t[0],
                     s * xy[:, 0] + c * xy[:, 1] + t[1]], axis=1)


class TestConstellationAlign:
    def test_recovers_large_drift(self):
        """Pairing must work far beyond any NN radius: 0.8 m translation
        + 0.4 rad rotation, with outliers on both sides."""
        rng = np.random.default_rng(3)
        shared = rng.uniform(-1, 1, size=(7, 2))
        dth, t = 0.4, np.array([0.8, -0.5])
        a = np.concatenate([shared, rng.uniform(-1, 1, size=(5, 2))])
        b = np.concatenate([_rigid(dth, t, shared) +
                            rng.normal(0, 0.01, (7, 2)),
                            rng.uniform(2, 4, size=(6, 2))])
        fit = _constellation_align(a, b, tol=0.05, min_inliers=5)
        assert fit is not None
        fdth, ft, (ra, rb), rms = fit
        assert abs(fdth - dth) < 0.05
        assert np.hypot(*(ft - t)) < 0.1
        assert len(ra) >= 5 and rms < 0.05

    def test_rejects_unrelated_sets(self):
        """Two independent random constellations must not reach the
        inlier floor (chance 5-point rigid coincidences)."""
        rng = np.random.default_rng(7)
        for trial in range(20):
            a = rng.uniform(-1.5, 1.5, size=(12, 2))
            b = rng.uniform(-1.5, 1.5, size=(12, 2))
            fit = _constellation_align(a, b, tol=0.03, min_inliers=6)
            assert fit is None, f"trial {trial}: chance fit {fit}"

    def test_one_to_one_no_aliasing(self):
        """A cluster of near-coincident b points must not let one a-point
        count as several inliers."""
        a = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0],
                      [0.5, 0.5]])
        b = np.concatenate([a, a[:1] + 0.01])        # duplicate target
        fit = _constellation_align(a, b, tol=0.05, min_inliers=5)
        assert fit is not None
        _, _, (ra, rb), _ = fit
        assert len(np.unique(rb)) == len(rb)


class TestRebase:
    def _kf(self):
        xyz = np.array([[1.0, 2.0, 3.0], [0.5, -0.5, 3.0]])
        return Keyframe(frame=10, pose=np.array([1.0, 2.0, 0.3]),
                        odo=np.zeros(3), lids=np.array([1, 2]),
                        pixels=np.zeros((2, 2)), xyz=xyz.copy(),
                        map_lids=np.array([1, 2]), map_xyz=xyz.copy())

    def test_rebase_moves_anchor_not_measurement(self):
        kf = self._kf()
        pf_before = kf.pose_filter.copy()
        new_pose = np.array([1.4, 2.2, 0.45])
        BackendSession._rebase(kf, new_pose)
        assert np.allclose(kf.pose, new_pose)
        # the immutable filter pose (measurement frame) must not move
        assert np.allclose(kf.pose_filter, pf_before)
        # the BA anchor follows the correction exactly
        assert np.allclose(kf.pose0, new_pose)

    def test_rebase_is_rigid_on_landmarks(self):
        kf = self._kf()
        d01 = np.linalg.norm(kf.xyz[0, :2] - kf.xyz[1, :2])
        rel0 = kf.xyz[0, :2] - np.asarray(kf.pose[:2])
        BackendSession._rebase(kf, np.array([1.5, 1.8, 0.9]))
        # inter-landmark distances and pose-relative offsets preserved
        assert np.isclose(
            np.linalg.norm(kf.xyz[0, :2] - kf.xyz[1, :2]), d01)
        c, s = np.cos(0.9 - 0.3), np.sin(0.9 - 0.3)
        want = np.array([c * rel0[0] - s * rel0[1],
                         s * rel0[0] + c * rel0[1]])
        assert np.allclose(kf.xyz[0, :2] - kf.pose[:2], want, atol=1e-9)


class TestTemporalConfirmation:
    """Commit policy: a loop candidate needs two temporally-consistent
    sightings (r4: a single 6-inlier chance alignment passed every static
    gate on TPU and made the recorded refined ATE REGRESS 0.287->0.872;
    genuine revisits re-fire with coherent drift at the next keyframe,
    chance alignments don't)."""

    def _backend_with_history(self, n_old=4):
        rng = np.random.default_rng(11)
        cfg = SlamConfig(dtype="float64", ba_window=2)
        bs = BackendSession(cfg, loop_min_sep=3)
        lms = np.stack([rng.uniform(-0.5, 0.5, 8),
                        rng.uniform(-0.5, 0.5, 8),
                        np.full(8, 3.0)], axis=1)
        for w in range(n_old):
            pose = np.array([0.05 * w, 0.0, 0.02 * w])
            bs.keyframes.append(Keyframe(
                frame=w, pose=pose, odo=pose, lids=np.arange(1, 9),
                pixels=np.zeros((8, 2)), xyz=lms.copy(),
                pose_sigma=np.full(3, 0.05)))
        return bs, lms

    def _revisit(self, frame, lids0, lms, dth, t):
        c, s = np.cos(dth), np.sin(dth)
        drifted = lms.copy()
        drifted[:, 0] = c * lms[:, 0] - s * lms[:, 1] + t[0]
        drifted[:, 1] = s * lms[:, 0] + c * lms[:, 1] + t[1]
        pose = np.array([t[0], t[1], dth])
        return Keyframe(frame=frame, pose=pose, odo=pose,
                        lids=np.arange(lids0, lids0 + 8),
                        pixels=np.zeros((8, 2)), xyz=drifted,
                        pose_sigma=np.full(3, 0.05))

    def test_single_sighting_stays_pending(self):
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        assert len(bs.loop_edges) == 0
        assert any(e.get("reason") == "unconfirmed" for e in bs.edge_log)

    def test_inconsistent_sightings_never_commit(self):
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        # same place, wildly different transform: chance-alignment pattern
        bs._add(self._revisit(11, 200, lms, 0.05, np.array([-0.2, 0.25])))
        assert len(bs.loop_edges) == 0

    def test_consistent_sightings_commit_both(self):
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        bs._add(self._revisit(11, 200, lms, 0.06, np.array([0.13, -0.07])))
        assert len(bs.loop_edges) == 2
        # both sightings of the validated place became graph constraints
        assert {(i, j) for i, j, _, _ in bs.loop_edges} == {(0, 4), (0, 5)}

    def test_thin_map_confirms_via_pending_hypothesis(self):
        """A second sighting whose keyframe map is too thin for the geo
        search floor still corroborates the pending via path (4): the
        pending transform is verified directly against the thin map
        (loose association at the drift-evolution tolerance, strict
        refit at the fit tol) — the slot-churn-minimum case measured on
        the frozen lap fixture (r5)."""
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        assert len(bs.loop_edges) == 0          # single sighting pends
        # second sighting with only 5 of the 8 landmarks visible (below
        # the 6-inlier geo floor) and the drift slightly evolved
        thin = self._revisit(11, 200, lms, 0.06, np.array([0.16, -0.05]))
        thin.map_xyz = thin.map_xyz[:5]
        thin.map_lids = thin.map_lids[:5]
        bs._add(thin)
        assert len(bs.loop_edges) == 2
        assert any(e.get("path") == "confirm" and e.get("accepted")
                   for e in bs.edge_log)

    def test_pending_hypothesis_rejects_wrong_transform(self):
        """Path (4) must NOT manufacture agreement: a pending whose
        transform does not describe the new sighting's geometry fails
        the strict refit and nothing commits."""
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        thin = self._revisit(11, 200, lms, 0.9, np.array([-0.8, 0.7]))
        thin.map_xyz = thin.map_xyz[:5]
        thin.map_lids = thin.map_lids[:5]
        bs._add(thin)
        assert len(bs.loop_edges) == 0

    def test_validated_place_commits_immediately(self):
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        bs._add(self._revisit(11, 200, lms, 0.06, np.array([0.13, -0.07])))
        bs._add(self._revisit(12, 300, lms, 0.07, np.array([0.14, -0.06])))
        assert len(bs.loop_edges) == 3

    def test_validated_fast_path_expires(self):
        """The skip-confirmation window for a validated place is
        time-limited — an open-ended fast path would re-admit the
        single-sighting chance alignments confirmation exists to kill."""
        bs, lms = self._backend_with_history()
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        bs._add(self._revisit(11, 200, lms, 0.06, np.array([0.13, -0.07])))
        n = len(bs.loop_edges)
        # leave the place: several keyframes with no sighting of it
        for w in range(4):
            pose = np.array([5.0 + 0.05 * w, 5.0, 0.0])
            bs.keyframes.append(Keyframe(
                frame=20 + w, pose=pose, odo=pose,
                lids=np.arange(500 + 8 * w, 508 + 8 * w),
                pixels=np.zeros((8, 2)),
                xyz=np.tile(pose, (8, 1)) + np.random.default_rng(w)
                .normal(0, 0.3, (8, 3)), pose_sigma=np.full(3, 0.05)))
        # a lone sighting beyond the TTL must go PENDING, not commit
        bs._add(self._revisit(30, 300, lms, 0.07, np.array([0.14, -0.06])))
        assert len(bs.loop_edges) == n
        assert any(e.get("reason") == "unconfirmed" for e in bs.edge_log)

    def test_eviction_keeps_pending_of_surviving_keyframe(self):
        """max_nodes eviction reindexes pending sightings like loop
        edges: pre-eviction index 1 must survive as 0 (a post-decrement
        filter wrongly discarded it — r4 review finding)."""
        bs, lms = self._backend_with_history(n_old=4)
        bs._add(self._revisit(10, 100, lms, 0.05, np.array([0.12, -0.08])))
        assert len(bs._pending) == 1
        # place the pending sighting at pre-eviction index 1 and evict:
        # index 1 survives as 0 (index 0 would be the evicted one)
        bs._pending[0]["i"] = 1
        bs.max_nodes = len(bs.keyframes)
        far = np.array([7.0, 7.0, 0.0])
        bs._add(Keyframe(
            frame=20, pose=far, odo=far, lids=np.arange(900, 908),
            pixels=np.zeros((8, 2)),
            xyz=np.tile(far, (8, 1))
            + np.random.default_rng(9).normal(0, 0.3, (8, 3)),
            pose_sigma=np.full(3, 0.05)))
        assert len(bs._pending) == 1
        assert bs._pending[0]["i"] == 0


@pytest.mark.slow
def test_loop_closure_end_to_end():
    """Live pipeline on a genuine revisit: 1.25 laps of a circle whose
    diameter exceeds the camera footprint, with heading-random-walk
    odometry noise. At least one loop edge must fire from real filter
    telemetry and the pose-graph-refined trajectory must beat the
    filter-only ATE."""
    from experiment import get_sequence
    from cv_monoslam_tpu.api import SlamSession

    seq, track, gt_xy, _ = get_sequence("lap@0.12", 120, 0, noise=0.04)
    assert len(track) > 100
    # ba_apply_gate=2: the commit path must be exercised end-to-end; at
    # the default 3.0 this scenario's window corrections sit just below
    # the gate (max_z ~2.5) and the applied-solve assertion is vacuous
    cfg = SlamConfig(max_landmarks=16, max_new_per_frame=4,
                     max_detections=32, keyframe_every=5, ba_window=4,
                     ba_apply_gate=2.0)
    backend = BackendSession(cfg)
    sess = SlamSession(cfg, seq, track, backend=backend)
    sess.run(chunk=8)

    assert len(backend.loop_edges) >= 1, "loop detection never fired"
    # the backend must not merely solve — at least one window solve must
    # COMMIT (VERDICT r3 item 6), and the summary must explain the edges
    summ = backend.summary(sess.refinements)
    assert summ["ba_applied"] >= 1, summ
    assert all(e["n_inliers"] >= backend.loop_min_shared
               for e in summ["edges"])
    ate_f = sess.ate(gt_xy)
    ate_r = sess.ate(gt_xy, refined=True)
    assert ate_r < ate_f * 0.95, (
        f"backend did not improve: filter {ate_f:.4f} vs "
        f"refined {ate_r:.4f}")
    # the closure must visibly pull the final (revisit) segment in
    ids = [int(track.frame_id[r.frame]) for r in sess.records]
    tail = slice(-15, None)
    err_f = np.hypot(*(sess.trajectory[tail, :2]
                       - gt_xy[ids][tail]).T).mean()
    err_r = np.hypot(*(sess.trajectory_refined[tail, :2]
                       - gt_xy[ids][tail]).T).mean()
    assert err_r < err_f
