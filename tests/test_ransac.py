"""1-point RANSAC innovation consensus (frontend.matching.one_point_ransac,
the reference's unfinished RANSAC branch SLAM.cpp:2097-2103)."""

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.frontend.matching import one_point_ransac


def test_outlier_rejected():
    cfg = SlamConfig(use_ransac=True, threshold_ransac=8.0)
    pred = jnp.asarray(np.zeros((6, 2)))
    # five consistent innovations (~(3, 1) px), one wild mis-association
    match = jnp.asarray([[3.0, 1.0], [3.5, 0.5], [2.5, 1.5], [3.2, 0.8],
                         [2.8, 1.2], [40.0, -25.0]])
    accepted = jnp.asarray([True] * 6)
    out = np.asarray(one_point_ransac(accepted, match, pred, cfg))
    assert out.tolist() == [True] * 5 + [False]


def test_small_sets_untouched():
    cfg = SlamConfig(use_ransac=True, threshold_ransac=8.0)
    pred = jnp.asarray(np.zeros((4, 2)))
    match = jnp.asarray([[3.0, 1.0], [40.0, -25.0], [0.0, 0.0], [0.0, 0.0]])
    accepted = jnp.asarray([True, True, False, False])
    out = np.asarray(one_point_ransac(accepted, match, pred, cfg))
    # two matches: consensus meaningless, all kept
    assert out.tolist() == [True, True, False, False]


def test_unaccepted_never_selected():
    cfg = SlamConfig(use_ransac=True, threshold_ransac=5.0)
    pred = jnp.asarray(np.zeros((5, 2)))
    match = jnp.asarray([[100.0, 100.0], [1.0, 0.0], [1.2, 0.1],
                         [0.8, -0.1], [1.1, 0.0]])
    accepted = jnp.asarray([False, True, True, True, True])
    out = np.asarray(one_point_ransac(accepted, match, pred, cfg))
    assert out.tolist() == [False, True, True, True, True]


def test_session_runs_with_ransac(tiny_sequence):
    from cv_monoslam_tpu.api import SlamSession

    seq, track, gt_xy, _ = tiny_sequence
    cfg = SlamConfig(max_landmarks=12, max_new_per_frame=6,
                     max_detections=24, use_ransac=True)
    sess = SlamSession(cfg, seq, track)
    sess.run(8)
    assert sess.ate(gt_xy) < 0.2
