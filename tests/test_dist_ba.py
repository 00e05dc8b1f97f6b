"""Distributed BA shard-invariance (SURVEY.md §4 item 5): the sharded
Schur-reduction solver must reproduce the single-device solution to
bit-tolerance on an 8-fake-device CPU mesh."""

import numpy as np
import jax

from cv_monoslam_tpu.backend.ba import ba_solve, reprojection_rmse
from cv_monoslam_tpu.config import CameraConfig, SlamConfig
from cv_monoslam_tpu.parallel.dist_ba import ba_solve_sharded
from cv_monoslam_tpu.parallel.mesh import make_mesh

from test_backend import _make_problem, CFG


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    # L=16 divides the 8-device mesh
    prob, poses_gt, lms_gt = _make_problem(rng, W=5, L=16, perturb=0.02)
    mesh = make_mesh(8)

    poses_s, lms_s, costs_s = ba_solve_sharded(prob, CFG, mesh)
    poses_1, lms_1, costs_1 = ba_solve(prob, CFG)

    np.testing.assert_allclose(np.asarray(poses_s), np.asarray(poses_1),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lms_s), np.asarray(lms_1),
                               rtol=1e-9, atol=1e-11)
    # costs decay toward machine epsilon where psum ordering matters:
    # absolute floor covers the converged tail, rtol the early iterations
    np.testing.assert_allclose(np.asarray(costs_s), np.asarray(costs_1),
                               rtol=1e-6, atol=1e-12)


def test_sharded_improves_geometry():
    rng = np.random.default_rng(1)
    prob, poses_gt, _ = _make_problem(rng, W=5, L=16, perturb=0.03)
    mesh = make_mesh(4)
    poses, lms, _ = ba_solve_sharded(prob, CFG, mesh)
    r = float(reprojection_rmse(poses, lms, prob, CFG))
    assert r < 1e-2


def test_mesh_sizes():
    rng = np.random.default_rng(2)
    prob, _, _ = _make_problem(rng, W=4, L=16, perturb=0.01)
    ref = None
    for n in (1, 2, 8):
        mesh = make_mesh(n)
        poses, _, _ = ba_solve_sharded(prob, CFG, mesh)
        poses = np.asarray(poses)
        if ref is None:
            ref = poses
        else:
            np.testing.assert_allclose(poses, ref, rtol=1e-9, atol=1e-11)
