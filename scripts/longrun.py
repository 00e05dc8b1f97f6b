"""Reference-scale run (VERDICT r3 item 6; CAPACITY = 3000, SLAM.h:127).

A 1000+ frame synthetic session with EVERYTHING enabled at once:

  * frames round-tripped through the MJPEG writer/reader (io/video) so
    the imagery carries real JPEG artifacts, not pristine float blobs;
  * noisy odometry (heading random walk), a multi-lap trajectory whose
    revisits exercise loop closure;
  * backend (window BA + pose-graph loop closure), watchdog, recorder,
    periodic checkpoints — the full production configuration.

Asserts finite health, bounded ATE, zero escalated covariance repairs,
stable stored-table behaviour and no monotonic slowdown, then prints a
summary line for BENCH notes.

Usage:  python scripts/longrun.py [--frames 1000] [--no-video]
(CPU: prefix PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu; TPU: run as-is.)
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           "jax" if jax.default_backend() != "cpu"
                           else "jax-cpu"))

import numpy as np

from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.backend.session import BackendSession
from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.io.dataset import preprocess_odometry
from cv_monoslam_tpu.io.recording import RunRecorder
from cv_monoslam_tpu.io.synthetic import (make_sequence, make_trajectory,
                                          make_world)
from cv_monoslam_tpu.io.video import VideoSequence, write_mjpeg_avi
from cv_monoslam_tpu.utils.watchdog import Watchdog
from experiment import noisy_odometry


def build_sequence(n: int, seed: int, noise: float, video: bool,
                   workdir: str):
    """Multi-lap circle + noisy odometry + (optional) JPEG round trip,
    cached on disk (rendering 1000 frames costs minutes)."""
    cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "seq",
                         f"longrun-{n}-{seed}-{noise}-v1.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        frames, raw, gt_xy = d["frames"], d["raw"], d["gt_xy"]
    else:
        cfg = SlamConfig()
        world = make_world(seed=seed, extent=14.0, cfg=cfg)
        # several laps of the big circle: period 192 frames. Poses repeat
        # exactly each lap (theta differs by full turns), so only ONE lap
        # is rendered and the frames tile — the noisy odometry does NOT
        # repeat, so the filter still sees a fresh estimation problem.
        lap = 192
        xy1, th1 = make_trajectory("loop", n=lap, step=0.06)
        laps = -(-n // lap)
        xy = np.tile(xy1, (laps, 1))[:n]
        th = np.concatenate([th1 + i * 2 * np.pi
                             for i in range(laps)])[:n]
        seq, _, gt1, _ = make_sequence(world, xy1, th1, cfg=cfg)
        gt_xy = np.tile(gt1, (laps, 1))[:n]
        frames = np.tile(seq._frames, (laps, 1, 1))[:n]
        odo_xy, odo_th = noisy_odometry(
            xy, th, np.random.default_rng(seed + 1), sigma_rot=noise)
        raw = np.concatenate([np.arange(n, dtype=float)[:, None],
                              odo_xy, odo_th[:, None]], axis=1)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez_compressed(cache, frames=frames, raw=raw, gt_xy=gt_xy)

    cfg = SlamConfig()
    track = preprocess_odometry(raw, min_step_xy=cfg.min_step_xy,
                                min_step_theta=cfg.min_step_theta)
    if video:
        avi = os.path.join(workdir, "longrun.avi")
        write_mjpeg_avi(avi, frames=np.clip(frames, 0, 255)
                        .astype(np.uint8))
        return VideoSequence(avi), track, gt_xy
    from cv_monoslam_tpu.io.dataset import ImageSequence

    return ImageSequence(frames=frames), track, gt_xy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--noise", type=float, default=0.01)
    p.add_argument("--no-video", action="store_true")
    args = p.parse_args()

    workdir = tempfile.mkdtemp(prefix="cvms_longrun_")
    seq, track, gt_xy = build_sequence(args.frames, 0, args.noise,
                                       not args.no_video, workdir)
    cfg = SlamConfig(max_landmarks=32, max_new_per_frame=8,
                     max_detections=48, keyframe_every=8, ba_window=4)
    sess = SlamSession(
        cfg, seq, track,
        recorder=RunRecorder(
            robot_path=os.path.join(workdir, "RobotPath.txt")),
        checkpoint_dir=workdir, checkpoint_every=200,
        watchdog=Watchdog(cfg, check_every=20),
        # 128 nodes x keyframe_every=8 -> a 1024-frame graph window, so
        # the refined trajectory covers the whole 1000-frame run (at
        # CAPACITY=3000 the window slides — honest sliding-window SLAM)
        backend=BackendSession(cfg, max_nodes=128),
    )
    t0 = time.time()
    sess.run(chunk=args.chunk)
    wall = time.time() - t0

    recs = sess.records
    n = len(recs)
    ate = sess.ate(gt_xy)
    ate_r = sess.ate(gt_xy, refined=True)
    last = recs[-1]
    thirds = max(n // 3, 1)
    w1 = float(np.mean([r.wall_time for r in recs[:thirds]]))
    w3 = float(np.mean([r.wall_time for r in recs[-thirds:]]))
    ckpts = [f for f in os.listdir(workdir) if f.startswith("ckpt_")]
    robot_lines = sum(1 for _ in open(
        os.path.join(workdir, "RobotPath.txt")))

    out = dict(frames=n, wall_s=round(wall, 1),
               fps=round(n / wall, 2),
               ate_filter=round(float(ate), 4),
               ate_refined=round(float(ate_r), 4),
               loop_edges=len(sess.backend.loop_edges),
               keyframes=len(sess.backend.keyframes),
               escalations=last.n_escalations,
               skipped=last.n_skipped,
               minor_repairs=last.n_repairs,
               watchdog_failures=sess.watchdog.n_failures,
               checkpoints=len(ckpts),
               recorded_lines=robot_lines,
               stored_valid=int(np.asarray(
                   sess.state.stored.valid).sum()),
               wall_first_third_ms=round(w1 * 1e3, 2),
               wall_last_third_ms=round(w3 * 1e3, 2),
               finite=bool(all(np.isfinite(r.pose).all() for r in recs)),
               video="off" if args.no_video else "mjpeg-roundtrip",
               backend=jax.default_backend(), workdir=workdir)
    print(json.dumps(out))
    print("backend summary:", json.dumps(
        sess.backend.summary(sess.refinements), default=str))

    assert out["finite"], "non-finite pose"
    assert out["escalations"] == 0, "reset-grade covariance repairs"
    assert out["recorded_lines"] >= n, "recorder missed frames"
    assert out["checkpoints"] >= args.frames // 250, "missing checkpoints"
    # no monotonic slowdown: the last third may not be >1.5x the first
    assert w3 < 1.5 * w1 + 0.005, f"slowdown {w1:.4f}->{w3:.4f}"
    print("LONGRUN OK")


if __name__ == "__main__":
    main()
