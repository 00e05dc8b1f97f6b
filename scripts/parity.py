"""Engine-vs-oracle parity table (SURVEY.md §4 item 4).

Runs the reference-faithful engine configuration against the serial oracle
frame by frame and prints pose divergence + map/match-set agreement, plus a
default-mode ATE comparison. See tests/test_parity.py for the CI gate.

Usage: python scripts/parity.py [--kind straight|arc] [--frames 12]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_CACHE_SUBDIR = "jax-cpu"  # persistent compile cache (set after jax import)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           _CACHE_SUBDIR))

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from experiment import get_sequence
from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.models.oracle import OracleSLAM

FAITHFUL = dict(max_landmarks=16, dtype="float64", update_mode="sequential",
                rho_init_mode="flat", subpixel_match=False,
                qr_mode="householder", detect_zero_blocks=True,
                downdate_mode="gmw")


def faithful_table(kind: str, frames: int):
    seq, track, gt_xy, _ = get_sequence(kind, frames + 4, 0)
    cfg = SlamConfig(**FAITHFUL)
    oracle = OracleSLAM(cfg, seq, track)
    sess = SlamSession(cfg, seq, track)
    print(f"\n== faithful mode, {kind} ==")
    print(f"{'frame':>5} {'pose_diff':>10} {'maps':>5} {'matches':>8}")
    for k in range(frames):
        if oracle.counter >= len(track):
            break
        oracle.step()
        rec = sess.step()
        lm = sess.state.lm
        act, lid = np.asarray(lm.active), np.asarray(lm.lid)
        mt = np.asarray(lm.matched)
        emap = sorted(int(l) for l, a in zip(lid, act) if a)
        ematch = sorted(int(l) for l, a, m in zip(lid, act, mt) if a and m)
        omap = sorted(l.lid for l in oracle.landmarks)
        omatch = sorted(l.lid for l in oracle.landmarks if l.matched)
        d = np.abs(np.asarray(rec.pose) - oracle.x[-4:]).max()
        print(f"{k + 1:>5} {d:>10.2e} "
              f"{'SAME' if omap == emap else 'DIFF':>5} "
              f"{'SAME' if omatch == ematch else 'DIFF':>8}")


def default_ate(kind: str, frames: int):
    """Default-mode trajectory quality: engine vs oracle ATE on the same
    sequence (both should track; the engine's batched update + subpixel
    matching is the accuracy-improved mode)."""
    seq, track, gt_xy, _ = get_sequence(kind, frames, 0)
    cfg = SlamConfig(max_landmarks=16, dtype="float64")
    oracle = OracleSLAM(cfg, seq, track)
    while oracle.counter < len(track):
        oracle.step()
    otraj = np.stack(oracle.traj)
    ids = track.frame_id[1 : len(otraj) + 1]
    o_ate = float(np.sqrt(((otraj[:, :2] - gt_xy[ids]) ** 2).sum(1).mean()))
    sess = SlamSession(cfg, seq, track)
    sess.run()
    e_ate = sess.ate(gt_xy)
    print(f"\n== default mode, {kind}: ATE engine {e_ate:.4f} m, "
          f"oracle {o_ate:.4f} m ==")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", default="straight,arc")
    p.add_argument("--frames", type=int, default=12)
    args = p.parse_args()
    for kind in args.kind.split(","):
        faithful_table(kind, args.frames)
        default_ate(kind, 30)


if __name__ == "__main__":
    main()
