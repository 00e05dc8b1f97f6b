"""Backend tests: sliding-window BA recovers perturbed geometry; pose graph
closes loops (SURVEY.md §4 item 3 extended to BASELINE config 4)."""

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.backend.ba import (BAProblem, ba_solve, project_planar,
                                        reprojection_rmse)
from cv_monoslam_tpu.backend.pose_graph import PoseGraph, pose_graph_solve
from cv_monoslam_tpu.config import CameraConfig, SlamConfig

CFG = SlamConfig(dtype="float64", ba_iters=8,
                 camera=CameraConfig(width=640, height=480))


def _make_problem(rng, W=5, L=12, noise=0.0, perturb=0.0):
    # ceiling landmarks above a short arc trajectory
    poses_gt = np.stack([
        0.08 * np.arange(W),
        0.02 * np.arange(W),
        0.05 * np.arange(W),
    ], axis=1)
    lms_gt = np.stack([
        rng.uniform(-0.4, 0.8, L),
        rng.uniform(-0.4, 0.6, L),
        np.full(L, 3.0) + rng.uniform(-0.1, 0.1, L),
    ], axis=1)

    obs = np.zeros((W, L, 2))
    mask = np.zeros((W, L), bool)
    for w in range(W):
        for l in range(L):
            px = np.asarray(project_planar(jnp.asarray(poses_gt[w]),
                                           jnp.asarray(lms_gt[l]), CFG))
            if 20 < px[0] < 620 and 20 < px[1] < 460:
                obs[w, l] = px + rng.normal(0, noise, 2)
                mask[w, l] = True
    odo_rel = np.zeros((W - 1, 3))
    for w in range(W - 1):
        c, s = np.cos(poses_gt[w, 2]), np.sin(poses_gt[w, 2])
        d = poses_gt[w + 1, :2] - poses_gt[w, :2]
        odo_rel[w] = [c * d[0] + s * d[1], -s * d[0] + c * d[1],
                      poses_gt[w + 1, 2] - poses_gt[w, 2]]

    poses0 = poses_gt + perturb * rng.normal(size=poses_gt.shape)
    poses0[0] = poses_gt[0]                       # gauge
    lms0 = lms_gt + 3 * perturb * rng.normal(size=lms_gt.shape)
    prob = BAProblem(
        poses=jnp.asarray(poses0), landmarks=jnp.asarray(lms0),
        obs=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        odo_rel=jnp.asarray(odo_rel),
        kf_mask=jnp.ones(W, bool), lm_mask=jnp.asarray(mask.sum(0) >= 2))
    return prob, poses_gt, lms_gt


def test_ba_recovers_perturbed_geometry():
    rng = np.random.default_rng(0)
    prob, poses_gt, lms_gt = _make_problem(rng, noise=0.0, perturb=0.02)
    r0 = float(reprojection_rmse(prob.poses, prob.landmarks, prob, CFG))
    poses, lms, costs = ba_solve(prob, CFG)
    r1 = float(reprojection_rmse(poses, lms, prob, CFG))
    assert r0 > 1.0            # perturbation visibly breaks reprojection
    assert r1 < 1e-3           # noiseless: exact recovery
    np.testing.assert_allclose(np.asarray(poses), poses_gt, atol=1e-3)
    lm_mask = np.asarray(prob.lm_mask)
    np.testing.assert_allclose(np.asarray(lms)[lm_mask], lms_gt[lm_mask],
                               atol=5e-3)
    # cost decreases monotonically (damped GN on a well-posed problem)
    c = np.asarray(costs)
    assert c[-1] < c[0]


def test_ba_noisy_observations_reduce_error():
    rng = np.random.default_rng(1)
    prob, poses_gt, _ = _make_problem(rng, noise=0.5, perturb=0.03)
    poses, lms, _ = ba_solve(prob, CFG)
    err0 = np.linalg.norm(np.asarray(prob.poses) - poses_gt, axis=1).mean()
    err1 = np.linalg.norm(np.asarray(poses) - poses_gt, axis=1).mean()
    assert err1 < 0.5 * err0


def test_ba_handles_empty_slots():
    """Unfilled keyframe/landmark slots must be exact no-ops."""
    rng = np.random.default_rng(2)
    prob, _, _ = _make_problem(rng, W=5, L=12, perturb=0.02)
    # disable the last keyframe and half the landmarks
    kf_mask = np.asarray(prob.kf_mask).copy()
    kf_mask[-1] = False
    lm_mask = np.asarray(prob.lm_mask).copy()
    lm_mask[6:] = False
    import dataclasses
    prob2 = dataclasses.replace(prob, kf_mask=jnp.asarray(kf_mask),
                                lm_mask=jnp.asarray(lm_mask))
    poses, lms, _ = ba_solve(prob2, CFG)
    assert np.all(np.isfinite(np.asarray(poses)))
    np.testing.assert_array_equal(np.asarray(poses)[-1],
                                  np.asarray(prob.poses)[-1])
    np.testing.assert_array_equal(np.asarray(lms)[6:],
                                  np.asarray(prob.landmarks)[6:])


def test_pose_graph_closes_loop():
    """Square path with odometry drift + one loop edge back to start."""
    n = 9
    nodes_gt = np.zeros((n, 3))
    # walk a square: 2 steps per side
    steps = [(0.5, 0), (0.5, 0), (0, 0.5), (0, 0.5),
             (-0.5, 0), (-0.5, 0), (0, -0.5), (0, -0.5)]
    for i, (dx, dy) in enumerate(steps):
        nodes_gt[i + 1] = nodes_gt[i] + [dx, dy, 0]

    # drifted initialization: each step slightly too long and rotated
    drift = np.zeros((n, 3))
    nodes0 = nodes_gt.copy()
    for i in range(1, n):
        drift[i] = drift[i - 1] + [0.02, 0.015, 0.01]
        nodes0[i] = nodes_gt[i] + drift[i]

    N, E = 12, 16
    nodes = np.zeros((N, 3))
    nodes[:n] = nodes0
    node_mask = np.zeros(N, bool)
    node_mask[:n] = True
    eij = np.zeros((E, 2), np.int32)
    erel = np.zeros((E, 3))
    ew = np.zeros((E, 3))
    emask = np.zeros(E, bool)
    for i in range(n - 1):
        eij[i] = (i, i + 1)
        d = nodes_gt[i + 1] - nodes_gt[i]
        c, s = np.cos(nodes_gt[i, 2]), np.sin(nodes_gt[i, 2])
        erel[i] = [c * d[0] + s * d[1], -s * d[0] + c * d[1], d[2]]
        ew[i] = (100.0, 100.0, 400.0)
        emask[i] = True
    # loop closure: node 8 is back at node 0
    eij[n - 1] = (0, 8)
    erel[n - 1] = [0.0, 0.0, 0.0]
    ew[n - 1] = (1e4, 1e4, 4e4)
    emask[n - 1] = True

    g = PoseGraph(nodes=jnp.asarray(nodes), edges_ij=jnp.asarray(eij),
                  edges_rel=jnp.asarray(erel), edges_w=jnp.asarray(ew),
                  edge_mask=jnp.asarray(emask),
                  node_mask=jnp.asarray(node_mask))
    opt, costs = pose_graph_solve(g, iters=15)
    opt = np.asarray(opt)
    # loop endpoint pulled back to the start
    gap_before = np.linalg.norm(nodes0[8, :2] - nodes0[0, :2])
    gap_after = np.linalg.norm(opt[8, :2] - opt[0, :2])
    assert gap_before > 0.1
    assert gap_after < 0.02
    # overall error vs ground truth shrinks
    e0 = np.linalg.norm(nodes0[:n, :2] - nodes_gt[:n, :2], axis=1).mean()
    e1 = np.linalg.norm(opt[:n, :2] - nodes_gt[:n, :2], axis=1).mean()
    assert e1 < 0.5 * e0


def test_window_ba_gate_holds_healthy_poses():
    """When BA agrees with the filter to within its sigma, corrections are
    NOT committed (window BA re-solves with strictly less data than the
    filter fused; sub-sigma corrections are noise)."""
    from cv_monoslam_tpu.backend.session import BackendSession, Keyframe

    rng = np.random.default_rng(4)
    cfg = SlamConfig(dtype="float64", ba_window=4, ba_iters=6,
                     ba_apply_gate=3.0)
    bs = BackendSession(cfg, max_nodes=8, max_lms=16)
    prob, poses_gt, lms_gt = _make_problem(rng, W=5, L=12, perturb=0.0)
    obs = np.asarray(prob.obs)
    mask = np.asarray(prob.obs_mask)
    for w in range(5):
        sel = np.flatnonzero(mask[w])
        bs.keyframes.append(Keyframe(
            frame=w, pose=poses_gt[w].copy(), odo=poses_gt[w],
            lids=sel + 1, pixels=obs[w, sel], xyz=lms_gt[sel],
            pose_sigma=np.full(3, 0.05)))
    before = [k.pose.copy() for k in bs.keyframes]
    out = bs.refine_window()
    assert out is not None and out["applied"] is False
    for k, p in zip(bs.keyframes, before):
        np.testing.assert_array_equal(k.pose, p)


def test_geometric_loop_detection_and_correction():
    """A revisit keyframe whose landmark estimates are a rigidly-drifted
    copy of an old keyframe's must produce a loop edge whose measurement
    recovers the drift (fresh landmark ids — the geometric pairing path)."""
    from cv_monoslam_tpu.backend.session import (BackendSession, Keyframe,
                                                 _relpose_np)

    rng = np.random.default_rng(5)
    cfg = SlamConfig(dtype="float64", ba_window=2)
    # loop_confirm=1: this test exercises single-sighting DETECTION; the
    # temporal-consistency commit policy has its own test below
    bs = BackendSession(cfg, loop_min_sep=3, loop_pair_radius=0.3,
                        loop_confirm=1)
    lms = np.stack([rng.uniform(-0.5, 0.5, 8), rng.uniform(-0.5, 0.5, 8),
                    np.full(8, 3.0)], axis=1)
    # old keyframe: accurate estimates
    for w in range(4):
        pose = np.array([0.05 * w, 0.0, 0.02 * w])
        bs.keyframes.append(Keyframe(
            frame=w, pose=pose, odo=pose, lids=np.arange(1, 9),
            pixels=np.zeros((8, 2)), xyz=lms.copy(),
            pose_sigma=np.full(3, 0.01)))
    # revisit: same physical landmarks, FRESH ids, rigid drift D
    dth, t = 0.05, np.array([0.12, -0.08])
    c, s = np.cos(dth), np.sin(dth)
    drifted = lms.copy()
    drifted[:, 0] = c * lms[:, 0] - s * lms[:, 1] + t[0]
    drifted[:, 1] = s * lms[:, 0] + c * lms[:, 1] + t[1]
    true_pose = np.array([0.03, 0.01, 0.0])
    est_pose = np.array([c * true_pose[0] - s * true_pose[1] + t[0],
                         s * true_pose[0] + c * true_pose[1] + t[1],
                         true_pose[2] + dth])
    kf = Keyframe(frame=10, pose=est_pose, odo=est_pose,
                  lids=np.arange(100, 108), pixels=np.zeros((8, 2)),
                  xyz=drifted, pose_sigma=np.full(3, 0.05))
    bs._add(kf)
    assert len(bs.loop_edges) >= 1
    i, j, rel, _ = bs.loop_edges[0]
    # the edge measurement recovers the TRUE relative pose
    old = bs.keyframes[i]
    rel_true = _relpose_np(old.pose0, true_pose)
    np.testing.assert_allclose(rel, rel_true, atol=1e-6)


def test_backend_session_end_to_end():
    """Keyframe collection -> window BA -> pose graph on synthetic data."""
    from cv_monoslam_tpu.backend.session import BackendSession, Keyframe

    rng = np.random.default_rng(3)
    cfg = SlamConfig(dtype="float64", ba_window=4, keyframe_every=1,
                     ba_iters=6)
    bs = BackendSession(cfg, max_nodes=8, max_lms=16)

    prob, poses_gt, lms_gt = _make_problem(rng, W=5, L=12, perturb=0.0)
    obs = np.asarray(prob.obs)
    mask = np.asarray(prob.obs_mask)
    for w in range(5):
        sel = np.flatnonzero(mask[w])
        kf = Keyframe(frame=w, pose=poses_gt[w] + rng.normal(0, 0.01, 3),
                      odo=poses_gt[w],
                      lids=sel + 1, pixels=obs[w, sel],
                      xyz=lms_gt[sel] + rng.normal(0, 0.02, (len(sel), 3)))
        bs.keyframes.append(kf)
    out = bs.refine_window()
    assert out is not None
    assert out["rmse_after"] < out["rmse_before"]
    gout = bs.optimize_graph()
    assert gout is not None and np.all(np.isfinite(gout["nodes"]))
