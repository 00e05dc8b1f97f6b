"""A/B experiment harness for oracle configuration choices.

Runs the oracle over a grid of (trajectory, seed, config overrides) and
reports ATE / heading error, with rendered sequences cached on disk so
repeated experiments are fast.
"""

import argparse
import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.io.dataset import ImageSequence, preprocess_odometry
from cv_monoslam_tpu.io.synthetic import (make_sequence, make_trajectory,
                                          make_world, noisy_odometry)
from cv_monoslam_tpu.models.oracle import OracleSLAM

CACHE = os.path.join(os.path.dirname(__file__), "..", ".cache", "seq")


def get_sequence(kind: str, n: int, seed: int, noise: float = 0.0,
                 step: float = 0.03):
    """Cached synthetic sequence. ``kind`` may carry a step suffix
    (e.g. ``"loop@0.06"``) so revisit-scale trajectories — where the
    camera footprint (~2.4 m at deep=3) must NOT cover the whole path —
    get distinct cache entries."""
    if "@" in kind:
        kind, s = kind.split("@")
        step = float(s)
    os.makedirs(CACHE, exist_ok=True)
    key = hashlib.md5(
        f"{kind}-{n}-{seed}-{noise}-{step}-v4".encode()).hexdigest()[:16]
    path = os.path.join(CACHE, key + ".npz")
    cfg = SlamConfig()
    if os.path.exists(path):
        d = np.load(path)
        frames, raw, gt_xy, gt_th = d["frames"], d["raw"], d["gt_xy"], d["gt_th"]
        track = preprocess_odometry(raw, min_step_xy=cfg.min_step_xy,
                                    min_step_theta=cfg.min_step_theta)
        return ImageSequence(frames=frames), track, gt_xy, gt_th
    world = make_world(seed=seed, cfg=cfg)
    xy, th = make_trajectory(kind, n=n, step=step)
    seq, _, gt_xy, gt_th = make_sequence(world, xy, th, cfg=cfg)
    odo_xy, odo_th = noisy_odometry(
        xy, th, np.random.default_rng(seed + 1), sigma_rot=noise)
    raw = np.concatenate([
        np.arange(n, dtype=np.float64)[:, None], odo_xy,
        odo_th[:, None]], axis=1)
    np.savez_compressed(path, frames=seq._frames, raw=raw, gt_xy=gt_xy,
                        gt_th=gt_th)
    track = preprocess_odometry(raw, min_step_xy=cfg.min_step_xy,
                                min_step_theta=cfg.min_step_theta)
    return seq, track, gt_xy, gt_th


def run_one(kind, n, seed, noise, **overrides):
    cfg = SlamConfig(**overrides)
    seq, track, gt_xy, gt_th = get_sequence(kind, n, seed, noise)
    o = OracleSLAM(cfg, seq, track)
    t0 = time.time()
    try:
        traj = o.run()
    except Exception as e:  # noqa: BLE001 - report crashes as results
        return dict(ate=float("nan"), th=float("nan"), err=repr(e), dt=0)
    dt = time.time() - t0
    m = len(traj)
    ids = track.frame_id[1 : m + 1]
    err = traj[:, :2] - gt_xy[ids]
    dth = np.arctan2(np.sin(traj[:, 3] - gt_th[ids]),
                     np.cos(traj[:, 3] - gt_th[ids]))
    return dict(ate=float(np.sqrt((err ** 2).sum(1).mean())),
                th=float(np.abs(dth).max()), err=None, dt=dt, frames=m)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=30)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--kinds", default="straight,arc")
    p.add_argument("--noise", type=float, default=0.0)
    args = p.parse_args()

    variants = {
        "ref-faithful": dict(rho_init_mode="flat", subpixel_match=False),
        "subpixel": dict(rho_init_mode="flat", subpixel_match=True),
        "ceiling": dict(rho_init_mode="ceiling", subpixel_match=False),
        "both": dict(rho_init_mode="ceiling", subpixel_match=True),
    }
    for kind in args.kinds.split(","):
        for name, ov in variants.items():
            ates, ths = [], []
            for seed in range(args.seeds):
                r = run_one(kind, args.n, seed, args.noise, **ov)
                ates.append(r["ate"])
                ths.append(r["th"])
            print(f"{kind:9s} {name:13s} ATE={np.mean(ates):.4f} "
                  f"(+/-{np.std(ates):.4f}) th_max={np.mean(ths):.4f} "
                  f"per-seed={[round(a,3) for a in ates]}")


if __name__ == "__main__":
    main()
