"""Runtime subsystems: recording formats, checkpoint round-trip, watchdog,
viz products, CLI (SURVEY.md §5 build equivalents)."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.config import CameraConfig, SlamConfig
from cv_monoslam_tpu.filter.state import init_state, replace
from cv_monoslam_tpu.io.recording import (FeaturesInfoRecorder,
                                          MetricsRecorder, RobotPathRecorder,
                                          RunRecorder, load_robot_path)
from cv_monoslam_tpu.utils.checkpoint import (latest_checkpoint,
                                              load_checkpoint,
                                              save_checkpoint)
from cv_monoslam_tpu.utils.watchdog import Watchdog, health_check

CFG = SlamConfig(max_landmarks=4, dtype="float64",
                 camera=CameraConfig(width=128, height=96, cx=64.0, cy=48.0))


def test_robot_path_roundtrip(tmp_path):
    p = str(tmp_path / "RobotPath.txt")
    r = RobotPathRecorder(p)
    cov = np.array([[1e-3, 1e-5], [1e-5, 2e-3]])
    r.record(1, np.array([0.1, 0.2]), np.array([0.11, 0.19]), cov)
    r.record(2, np.array([0.2, 0.3]), np.array([0.21, 0.29]), cov)
    r.close()
    back = load_robot_path(p)
    assert list(back["frame"]) == [1, 2]
    np.testing.assert_allclose(back["est_xy"][0], [0.11, 0.19], atol=1e-6)
    np.testing.assert_allclose(back["pose_cov"][1], cov, rtol=1e-4)


def test_features_and_metrics(tmp_path):
    fp = str(tmp_path / "FeaturesInfo.txt")
    f = FeaturesInfoRecorder(fp)
    f.record(3, np.array([7, 9]), np.array([[1.0, 2, 3], [4, 5, 6]]),
             np.array([True, True]))
    f.close()
    lines = open(fp).read().splitlines()
    assert lines[0] == "# frame 3"
    assert lines[1].startswith("7 1.0")

    mp = str(tmp_path / "m.jsonl")
    m = MetricsRecorder(mp)
    m.record(frame=1, pose=np.array([1.0, 2.0]), n_map=5)
    m.close()
    rec = json.loads(open(mp).read())
    assert rec["frame"] == 1 and rec["n_map"] == 5
    assert rec["pose"] == [1.0, 2.0]


def test_checkpoint_roundtrip(tmp_path):
    state = init_state(CFG)
    x = np.asarray(state.x).copy()
    x[-4:] = [0.5, -0.25, 0.0, 0.3]
    state = replace(state, x=jnp.asarray(x))
    p = str(tmp_path / "ck" / "ckpt_000010.npz")
    save_checkpoint(p, state, 10, CFG)
    s2, counter, cfg2, _ = load_checkpoint(p)
    assert counter == 10
    assert cfg2.max_landmarks == CFG.max_landmarks
    np.testing.assert_array_equal(np.asarray(s2.x), x)
    np.testing.assert_array_equal(np.asarray(s2.S), np.asarray(state.S))
    assert latest_checkpoint(str(tmp_path / "ck")) == p


def test_watchdog_detects_and_recovers():
    state = init_state(CFG)
    flags = np.asarray(health_check(state, CFG))
    assert flags.all()

    bad_x = np.asarray(state.x).copy()
    bad_x[0] = np.nan
    bad = replace(state, x=jnp.asarray(bad_x))
    wd = Watchdog(CFG, check_every=1)
    report = wd.check(bad)
    assert not report.ok and not report.finite

    recovered = wd.recover(bad, theta_odo=0.7)
    assert bool(jnp.all(jnp.isfinite(recovered.x)))
    assert float(recovered.x[-1]) == 0.7
    assert not bool(jnp.any(recovered.lm.active))


def test_viz_products(tmp_path):
    from cv_monoslam_tpu import viz

    state = init_state(CFG)
    x = np.asarray(state.x).copy()
    x[0:6] = [0, 0, 0, 0.01, 0.01, 1 / 3.0]
    act = np.zeros(4, bool)
    act[0] = True
    state = replace(state, x=jnp.asarray(x),
                    lm=replace(state.lm, active=jnp.asarray(act),
                               visible=jnp.asarray(act),
                               lid=jnp.asarray([5, 0, 0, 0], np.int32),
                               pred=jnp.asarray(
                                   [[60.0, 40], [0, 0], [0, 0], [0, 0]])))
    info = viz.landmark_display_info(state, CFG)
    assert info["xyz"].shape == (4, 3)
    assert np.all(np.isfinite(info["sigma"][0]))
    # landmark 0 points nearly straight up from origin at depth 3
    np.testing.assert_allclose(info["xyz"][0, 2], 3.0, atol=0.1)

    est = np.cumsum(np.ones((10, 2)) * 0.01, axis=0)
    p1 = viz.plot_trajectory(est, est + 0.01,
                             path=str(tmp_path / "t.png"))
    img = np.random.default_rng(0).uniform(0, 255, (96, 128))
    p2 = viz.draw_overlay(img, state, CFG, path=str(tmp_path / "o.png"))
    p3 = viz.plot_map3d(state, CFG, est_path=est,
                        path=str(tmp_path / "m.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_cli_synthetic_run(tmp_path):
    """End-to-end CLI: synthetic run with recording + viz, tiny frames."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = str(tmp_path / "out")
    res = subprocess.run(
        [sys.executable, "-m", "cv_monoslam_tpu", "run",
         "--frames", "8", "--out", out, "--record", "--viz",
         "--watchdog", "--set", "max_landmarks=16",
         "--set", "max_detections=32", "--set", "max_new_per_frame=8"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "RobotPath.txt"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "trajectory.npz"))
    assert os.path.exists(os.path.join(out, "trajectory.png"))
    assert "ATE" in res.stdout
